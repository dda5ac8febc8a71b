"""Bottom-k (reservoir-equivalent) and weighted priority sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.sampling import (
    bottom_k_sample,
    weighted_priority_sample,
)


def test_bottom_k_exact_size_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bottom_k_sample(docs, k=7, stratum_col="lang")
    sizes = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(7, full[lang])
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in bottom_k_sample(docs, k=7, stratum_col="lang").collect())
    assert a == b


def test_global_bottom_k_uses_take_ordered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bottom_k_sample(docs, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # no full sort of the corpus


def test_weighted_sample_prefers_heavy_rows(spark):
    # 200 rows: weight 1000 vs weight 1.  A k=50 weighted sample should
    # be dominated by heavy rows (each heavy priority ~1000x smaller).
    rows = ", ".join(
        f"({i}, 'doc_{i}', {1000 if i < 100 else 1})" for i in range(200)
    )
    df = spark.sql(f"SELECT * FROM VALUES {rows} AS t(doc_id, text, w)")
    out = weighted_priority_sample(df, k=50, weight_col="w", key_col="text")
    got = [r.doc_id for r in out.collect()]
    assert len(got) == 50
    heavy = sum(1 for d in got if d < 100)
    assert heavy >= 45  # overwhelmingly the heavy stratum
    ranks = sorted(r.sample_rank for r in out.collect())
    assert ranks == list(range(1, 51))
