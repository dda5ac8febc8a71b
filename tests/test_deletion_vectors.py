"""Position-based deletion vectors: positional (not key) semantics,
broadcast anti-join plan, and merge-on-read survivor correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.merge import (
    position_deletes,
    read_with_deletes,
)


def _base(spark, tmp_path):
    # duplicate keys on purpose: positional deletes must distinguish them
    path = str(tmp_path / "base")
    spark.sql(
        "SELECT * FROM VALUES (1, 'a'), (1, 'b'), (2, 'c'), (3, 'd') "
        "AS t(k, v)"
    ).repartition(2).write.parquet(path)
    return spark.read.parquet(path)


def test_positional_delete_hits_only_matching_positions(spark, tmp_path):
    scan = _base(spark, tmp_path)
    dv = position_deletes(scan, F.col("v") == "a")
    assert dv.count() == 1
    live = read_with_deletes(scan, dv)
    rows = {(r.k, r.v) for r in live.collect()}
    # the OTHER k=1 row survives: deletion is by position, not key
    assert rows == {(1, "b"), (2, "c"), (3, "d")}


def test_delete_read_plan_is_broadcast_anti(spark, tmp_path):
    scan = _base(spark, tmp_path)
    dv = position_deletes(scan, F.col("k") == 2)
    plan = (
        read_with_deletes(scan, dv)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan and "Broadcast" in plan
    assert "SortMergeJoin" not in plan  # base table must not shuffle


def test_empty_dv_is_identity(spark, tmp_path):
    scan = _base(spark, tmp_path)
    dv = position_deletes(scan, F.lit(False))
    assert read_with_deletes(scan, dv).count() == scan.count()
    assert read_with_deletes(scan, dv).columns == scan.columns
