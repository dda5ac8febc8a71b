"""AQE skew-join handling: a hot key must trigger OptimizeSkewedJoin
partition splitting (the runtime answer to skew that salting solves
statically — see operators/util.salted_aggregate for the static form)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    # shrink thresholds so the tiny fixture's hot partition counts as
    # skewed; restore after
    keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_skewed_join_splits_hot_partition(spark, skew_conf):
    # 200k rows of key 0 + 2k uniform rows vs a 100-row dim table
    left = spark.range(202_000).select(
        F.when(F.col("id") < 200_000, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), F.lit("dim").alias("name")
    )
    joined = left.join(right, "k")
    # execute THIS dataframe's own QueryExecution: AQE finalizes the
    # adaptive plan per-execution (count() would run a different one)
    assert len(joined.collect()) == 202_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # AQEShuffleRead split the hot partition
