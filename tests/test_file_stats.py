"""File-layout diagnostics from scan _metadata (compaction decisions)."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.util import (
    file_stats,
    layout_report,
)


def test_file_stats_counts_per_file(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(1000).repartition(4).write.parquet(path)
    scan = spark.read.parquet(path)
    rows = file_stats(scan).collect()
    assert len(rows) == 4
    assert sum(r.n_rows for r in rows) == 1000
    assert all(r.file_size > 0 for r in rows)


def test_layout_report_flags_small_files(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(100).repartition(5).write.parquet(path)
    rep = layout_report(spark.read.parquet(path), target_bytes=1 << 30).collect()[0]
    # every tiny fixture file is far below half of a 1 GiB target
    assert rep.n_files == 5 == rep.n_small_files
    assert rep.total_rows == 100
    assert rep.min_file_rows <= rep.max_file_rows
