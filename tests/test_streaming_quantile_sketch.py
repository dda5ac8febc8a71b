"""Streaming running-quantile via bounded equi-depth summary state
(streaming/stateful.py:streaming_quantile_sketch): the estimate must
track the true median within the emitted rank-error budget across
micro-batches, with the summary capped at 32 points."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    streaming_quantile_sketch,
)

SCHEMA = "event_type string, ts timestamp, event_id long, value double"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} "
        "AS t(event_type, ts, event_id, value)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(kind, start_id, values):
    return ", ".join(
        f"('{kind}', TIMESTAMP '2024-01-01 10:00:00', {start_id + i}, "
        f"CAST({v} AS DOUBLE))"
        for i, v in enumerate(values)
    )


def test_streaming_median_tracks_within_budget(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # batch 1: values 1..100 (median 50); batch 2 shifts the
    # distribution upward: 101..300 → combined 1..300, median 150
    _write_file(
        spark, _rows("m", 0, range(1, 101)), stage, "b1.parquet"
    )
    _write_file(
        spark, _rows("m", 1000, range(101, 301)), stage, "b2.parquet"
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_quantile_sketch(stream)
        .writeStream.format("memory")
        .queryName("qsketch_out")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    rows = sorted(
        spark.sql("SELECT * FROM qsketch_out").collect(),
        key=lambda r: r.n_seen,
    )
    assert [r.n_seen for r in rows] == [100, 300]
    for r in rows:
        assert r.summary_size <= 32
    # exact medians in cents: 5000 (of 1..100·100) and 15000 (of
    # 1..300·100).  The value grid is 100-cent-spaced, so a rank error
    # of k steps moves the estimate ≤ 100·k cents.
    b1, b2 = rows
    assert abs(b1.est_p50_cents - 5000) <= 100 * (b1.rank_err_bound + 1)
    assert abs(b2.est_p50_cents - 15000) <= 100 * (b2.rank_err_bound + 1)
    # the budget is explicit and grows only on compaction
    assert 0 < b1.rank_err_bound <= b2.rank_err_bound
    # state survives batches: batch 2's estimate reflects BOTH batches
    assert b2.est_p50_cents > 10000


def test_streaming_sketch_restart_resumes_state(spark, tmp_path):
    stage = str(tmp_path / "stage")
    wal = str(tmp_path / "wal")
    out = str(tmp_path / "out")
    _write_file(spark, _rows("m", 0, range(1, 101)), stage, "b1.parquet")

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            streaming_quantile_sketch(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", wal)
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_once()
    _write_file(spark, _rows("m", 1000, range(101, 301)), stage, "b2.parquet")
    run_once()
    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.n_seen
    )
    # the restarted query restored the 100-value summary from the WAL:
    # its output reflects all 300 values, not just batch 2
    assert rows[-1].n_seen == 300
    assert abs(rows[-1].est_p50_cents - 15000) <= 100 * (
        rows[-1].rank_err_bound + 1
    )
