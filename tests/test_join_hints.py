"""Join-strategy hints: the physical strategies a tuned 100 TB job
pins explicitly (broadcast for dims, shuffle-hash to skip sorts on
uniform keys, merge for sorted-bucketed inputs) are all reachable."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _tables(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return o, c


def test_broadcast_hint(spark, sf_dir):
    o, c = _tables(spark, sf_dir)
    plan = _plan(o.join(F.broadcast(c), o.o_custkey == c.c_custkey))
    assert "BroadcastHashJoin" in plan


def test_shuffle_hash_hint(spark, sf_dir):
    o, c = _tables(spark, sf_dir)
    plan = _plan(o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan  # hint skipped both sort passes


def test_merge_hint(spark, sf_dir):
    o, c = _tables(spark, sf_dir)
    plan = _plan(o.join(c.hint("merge"), o.o_custkey == c.c_custkey))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
