"""Compaction planning (operators/layout.py::compaction_plan): the
first-fit-in-sort-order bin assignment and its conservation/contiguity
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.layout import (
    compaction_plan,
)
from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES


def _inventory(spark, rows):
    values = ", ".join(f"({k}, {s})" for k, s in rows)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t(k, size_bytes)")


def test_first_fit_bins_follow_exclusive_prefix(spark):
    # prefixes 0, 100, 300, 600 at target 250 -> bins 0, 0, 1, 2
    inv = _inventory(spark, [(1, 100), (2, 200), (3, 300), (4, 50)])
    got = {
        r["bin"]: (r["n_files"], r["total_bytes"], r["first_key"], r["last_key"])
        for r in compaction_plan(inv, "k", "size_bytes", 250).collect()
    }
    assert got == {0: (2, 300, 1, 2), 1: (1, 300, 3, 3), 2: (1, 50, 4, 4)}


def test_oversized_file_keeps_its_own_bin(spark):
    # a file bigger than target never merges with its successor
    inv = _inventory(spark, [(1, 1000), (2, 10), (3, 10)])
    got = {
        r["bin"]: r["n_files"]
        for r in compaction_plan(inv, "k", "size_bytes", 100).collect()
    }
    assert got[0] == 1 and sum(got.values()) == 3


def test_plan_conserves_and_stays_contiguous(spark, sf_dir):
    files = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg((F.count(F.lit(1)) * 120).cast("long").alias("size_bytes"))
    )
    n_files, total = files.agg(
        F.count(F.lit(1)), F.sum("size_bytes")
    ).first()
    plan = compaction_plan(files, "d", "size_bytes", 4096).collect()
    assert sum(r["n_files"] for r in plan) == n_files
    assert sum(r["total_bytes"] for r in plan) == total
    by_bin = sorted(plan, key=lambda r: r["bin"])
    # bins are non-decreasing and merge disjoint ADJACENT key ranges
    # (range clustering must survive compaction); an oversized file
    # may skip bin indices, so density is not asserted
    assert by_bin[0]["bin"] == 0
    for a, b in zip(by_bin, by_bin[1:]):
        assert a["bin"] < b["bin"]
        assert a["last_key"] < b["first_key"]
    # the registered query is this plan with formatted dates
    q = QUERIES["files_compaction_plan"](spark, sf_dir)
    assert q.count() == len(by_bin)
