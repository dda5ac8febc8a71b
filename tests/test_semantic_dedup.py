"""SemDeDup-shaped semantic dedup (operators/dedup.py
semantic_dedup_pairs): deterministic integer k-means + within-cluster
cosine pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    semantic_dedup_pairs,
)


def _emb(spark, rows):
    """rows: [(vec_id, [floats])] → DataFrame(vec_id, embedding)."""
    vals = ", ".join(
        f"({i}, array({', '.join(str(x) for x in v)}))" for i, v in rows
    )
    return spark.sql(
        f"SELECT vec_id, embedding FROM VALUES {vals} AS t(vec_id, embedding)"
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))


def test_planted_near_dups_found_within_cluster(spark):
    """Two tight groups far apart; near-identical vectors inside each
    group must pair up, cross-group pairs must not appear."""
    d = 8
    g1 = [1.0] + [0.0] * (d - 1)
    g1b = [0.999, 0.01] + [0.0] * (d - 2)
    g2 = [0.0] * (d - 1) + [1.0]
    g2b = [0.0] * (d - 2) + [0.01, 0.999]
    far = [0.0, 1.0] + [0.0] * (d - 2)
    df = _emb(spark, [(1, g1), (2, g2), (3, g1b), (4, g2b), (5, far)])
    got = {
        (r.vec_a, r.vec_b)
        for r in semantic_dedup_pairs(df, n_cells=2, threshold_milli=900).collect()
    }
    assert (1, 3) in got
    assert (2, 4) in got
    assert all(p in {(1, 3), (2, 4)} or (5 in p) for p in got)


def test_orthogonal_vectors_emit_nothing(spark):
    d = 8
    rows = [(i, [1.0 if j == i else 0.0 for j in range(d)]) for i in range(d)]
    df = _emb(spark, rows)
    assert semantic_dedup_pairs(df, n_cells=2, threshold_milli=400).count() == 0


def test_deterministic_across_runs(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)]) for i in range(40)
    ]
    df = _emb(spark, rows)
    a = sorted(
        map(tuple, semantic_dedup_pairs(df, n_cells=4, threshold_milli=300).collect())
    )
    b = sorted(
        map(tuple, semantic_dedup_pairs(df, n_cells=4, threshold_milli=300).collect())
    )
    assert a == b
