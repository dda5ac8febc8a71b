"""Greedy k-center coreset (operators/similarity.py kcenter_coreset):
farthest-first invariants — monotone selection distances, coverage
radius bounded by the last pick, and picks that actually spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.functions.vectors import (
    quantize_embedding,
    sqdist_q,
)
from aws_kinesis_data_streams_replicator_spark.operators.similarity import (
    kcenter_coreset,
)


def test_farthest_first_invariants(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = sorted(
        kcenter_coreset(emb, k=6).collect(), key=lambda r: r["round"]
    )
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert len({r["vec_id"] for r in rows}) == 6
    # seed is the smallest vec_id, at distance 0
    assert rows[0]["vec_id"] == emb.agg(F.min("vec_id")).first()[0]
    assert rows[0]["sel_dist_q"] == 0
    # selection distances are non-increasing (each pick was the argmax
    # of a min-distance that only ever shrinks)
    dists = [r["sel_dist_q"] for r in rows[1:]]
    assert dists == sorted(dists, reverse=True)
    # the k-center guarantee: after k picks every vector is within
    # radius of a pick, and that radius never exceeds the k-th
    # selection distance
    radius = rows[0]["radius_q"]
    assert all(r["radius_q"] == radius for r in rows)
    assert radius <= dists[-1]
    # cross-check radius exactly: max over corpus of min-dist to picks
    q = emb.select(
        "vec_id", quantize_embedding(F.col("embedding")).alias("qe")
    )
    picks = q.where(F.col("vec_id").isin([r["vec_id"] for r in rows]))
    exact = (
        q.crossJoin(
            F.broadcast(picks.select(F.col("qe").alias("c_qe")))
        )
        .select("vec_id", sqdist_q(F.col("qe"), F.col("c_qe")).alias("d"))
        .groupBy("vec_id")
        .agg(F.min("d").alias("mind"))
        .agg(F.max("mind"))
        .first()[0]
    )
    assert radius == exact


def test_deterministic_across_runs(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, kcenter_coreset(emb, k=4).collect()))
    b = sorted(map(tuple, kcenter_coreset(emb, k=4).collect()))
    assert a == b


def test_coreset_centroids_are_the_picks(spark, sf_dir):
    """IVF seeding contract (r9): coreset_centroids returns exactly the
    k farthest-first picks — cell id = pick vec_id, c_qe = the pick's
    quantized embedding (the _ivf_default_centroids convention, so
    ivf_topk consumes them unchanged)."""
    from aws_kinesis_data_streams_replicator_spark.operators.similarity import (
        coreset_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    picks = {r["vec_id"] for r in kcenter_coreset(emb, k=4).collect()}
    cents = coreset_centroids(emb, k=4).collect()
    assert {r["cell"] for r in cents} == picks
    q = {
        r["vec_id"]: r["qe"]
        for r in emb.select(
            "vec_id", quantize_embedding(F.col("embedding")).alias("qe")
        )
        .where(F.col("vec_id").isin(list(picks)))
        .collect()
    }
    for r in cents:
        assert list(r["c_qe"]) == list(q[r["cell"]])
