"""The two operators that exist in BOTH a Python-surface form and a
JVM production form must agree exactly:

* user_activity_stats (applyInPandas demo) vs user_activity_stats_jvm
  (lag window + hash agg) — byte-identical rows.
* lloyd_centroids is deterministic across runs/partitionings and feeds
  ivf_topk unchanged (cell ids are seed vec_ids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import similarity
from aws_kinesis_data_streams_replicator_spark.operators.udfs import (
    user_activity_stats,
    user_activity_stats_jvm,
)
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_user_stats_jvm_equals_pandas(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    assert _rows(user_activity_stats_jvm(events)) == _rows(
        user_activity_stats(events)
    )


def test_lloyd_centroids_deterministic_and_partition_independent(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = _rows(similarity.lloyd_centroids(emb, n_cells=8, n_iters=2))
    b = _rows(similarity.lloyd_centroids(emb.repartition(13), n_cells=8, n_iters=2))
    assert a == b  # int64 sums + DIV are associative/portable
    assert len(a) == 8
    cells = [r[0] for r in a]
    assert cells == sorted(cells)


def test_lloyd_refinement_changes_seed_centroids(spark, sf_dir):
    """After a Lloyd round the centroid is a cell mean, not the raw seed
    vector (refinement actually ran)."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = _rows(
        similarity._quantized(emb.orderBy("vec_id").limit(8), "vec_id")
    )
    trained = _rows(similarity.lloyd_centroids(emb, n_cells=8, n_iters=1))
    assert [r[1] for r in trained] != [r[1] for r in seeds]


def test_lloyd_ivf_recall_vs_brute_force(spark, sf_dir):
    """Trained cells should retrieve a solid fraction of the true top-10
    (same bar the first-N-centroid variant meets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, qs, k=10).collect()
    }
    cent = similarity.lloyd_centroids(emb, n_cells=16, n_iters=2)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            emb, qs, k=10, n_probe=4, centroids=cent
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.5
