"""Runtime bloom-filter join pruning (Spark 3.3+ InjectRuntimeFilter).

At 100 TB the classic selective-dim ⋈ huge-fact shape wastes most of the
fact shuffle on rows that can never match.  Catalyst's runtime bloom
filter builds a bloom over the creation (dim) side's join keys and
semi-filters the application (fact) side BEFORE its shuffle — the same
effect as a manual bloom pre-filter operator, but planner-injected, so
we assert the plan contract instead of hand-building one
(`bloom_filter_agg` is not a public function in Spark 4).

Thresholds are tuned down because the fixture is tiny; at real scale the
defaults (10 MB creation side, 10 GB application side) gate it to
exactly the shapes where it pays.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bloom_confs(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _shapes(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    joined = lineitem.join(dim, lineitem.l_orderkey == dim.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_custkey"
    )
    return joined


def test_bloom_filter_injected_on_selective_join(bloom_confs, sf_dir):
    spark = bloom_confs
    joined = _shapes(spark, sf_dir)
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in optimized and "might_contain" in optimized, (
        "expected InjectRuntimeFilter to add a bloom semi-filter on the "
        "fact side; optimized plan:\n" + optimized[:2000]
    )


def test_bloom_filter_preserves_results(bloom_confs, sf_dir):
    spark = bloom_confs
    with_bloom = sorted(
        (r.l_orderkey, r.o_custkey) for r in _shapes(spark, sf_dir).collect()
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without = sorted(
            (r.l_orderkey, r.o_custkey)
            for r in _shapes(spark, sf_dir).collect()
        )
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert with_bloom == without and len(with_bloom) > 0
