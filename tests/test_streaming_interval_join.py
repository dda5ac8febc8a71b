"""Watermarked stream-stream interval join
(streaming/job.py:streaming_interval_join): attribution pairs across
two live streams with bounded state — matches must equal the batch
interval join on the same data, survive a WAL restart across
micro-batches, and respect the max-delay window."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_interval_join,
)

SCHEMA = "event_type string, ts timestamp, event_id long, value double, user_id long"


def _write_file(spark, rows, stage, name):
    rows_sql = ", ".join(
        f"('{et}', TIMESTAMP '{ts}', {eid}, CAST(0.0 AS DOUBLE), {uid})"
        for (et, ts, eid, uid) in rows
    )
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} "
        "AS t(event_type, ts, event_id, value, user_id)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _run(spark, trig_stage, out_stage, sink_dir, wal):
    trig = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(trig_stage)
    )
    outc = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_stage)
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink_dir)

    q = (
        streaming_interval_join(trig, outc, max_delay="10 minutes")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", wal)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)


def test_interval_join_matches_batch_semantics(spark, tmp_path):
    """All pairs within [trigger_ts, trigger_ts+10min] for the same
    user — and nothing else — with per-pair lag; verified against the
    identical batch join."""
    trig_stage = str(tmp_path / "trig")
    out_stage = str(tmp_path / "outc")
    sink_dir = str(tmp_path / "sink")
    impressions = [
        ("imp", "2024-01-01 10:00:00", 1, 7),
        ("imp", "2024-01-01 10:02:00", 2, 7),
        ("imp", "2024-01-01 10:00:00", 3, 8),  # other user
        ("imp", "2024-01-01 12:00:00", 4, 7),  # far later
    ]
    clicks = [
        ("click", "2024-01-01 10:05:00", 101, 7),  # hits imp 1 AND 2
        ("click", "2024-01-01 10:20:00", 102, 7),  # outside both
        ("click", "2024-01-01 10:01:00", 103, 8),  # hits imp 3
        ("click", "2024-01-01 09:59:00", 104, 7),  # BEFORE any trigger
    ]
    _write_file(spark, impressions, trig_stage, "b1.parquet")
    _write_file(spark, clicks, out_stage, "b1.parquet")
    _run(spark, trig_stage, out_stage, sink_dir, str(tmp_path / "wal"))

    got = sorted(
        (r.trigger_event_id, r.outcome_event_id, r.lag_seconds)
        for r in spark.read.parquet(sink_dir).collect()
    )
    assert got == [(1, 101, 300), (2, 101, 180), (3, 103, 60)]


def test_interval_join_restart_matches_across_batches(spark, tmp_path):
    """A trigger buffered in batch 1 must still match an outcome
    arriving after a full stop/restart — the join state round-trips
    the WAL."""
    trig_stage = str(tmp_path / "trig")
    out_stage = str(tmp_path / "outc")
    sink_dir = str(tmp_path / "sink")
    wal = str(tmp_path / "wal")
    _write_file(
        spark, [("imp", "2024-01-01 10:00:00", 1, 7)], trig_stage,
        "b1.parquet",
    )
    _write_file(
        spark, [("click", "2024-01-01 10:00:30", 100, 9)], out_stage,
        "b1.parquet",  # non-matching user keeps batch 1 non-empty
    )
    _run(spark, trig_stage, out_stage, sink_dir, wal)
    assert not os.path.exists(sink_dir) or not (
        spark.read.parquet(sink_dir).count()
        if glob.glob(os.path.join(sink_dir, "*.parquet"))
        else 0
    )
    _write_file(
        spark, [("click", "2024-01-01 10:04:00", 101, 7)], out_stage,
        "b2.parquet",
    )
    _run(spark, trig_stage, out_stage, sink_dir, wal)
    rows = spark.read.parquet(sink_dir).collect()
    assert [(r.trigger_event_id, r.outcome_event_id, r.lag_seconds)
            for r in rows] == [(1, 101, 240)]


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """An impression with no qualifying click must emit exactly once
    with null outcome fields — but only after the outcome watermark
    proves no click can still arrive in its window."""
    trig_stage = str(tmp_path / "trig")
    out_stage = str(tmp_path / "outc")
    sink_dir = str(tmp_path / "sink")
    wal = str(tmp_path / "wal")
    _write_file(
        spark, [("imp", "2024-01-01 10:00:00", 1, 7)], trig_stage,
        "b1.parquet",
    )
    _write_file(
        spark, [("click", "2024-01-01 10:00:10", 100, 9)], out_stage,
        "b1.parquet",
    )

    def run():
        trig = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(trig_stage)
        )
        outc = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(out_stage)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink_dir)

        q = (
            streaming_interval_join(
                trig, outc, max_delay="10 minutes",
                join_type="left_outer",
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", wal)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run()
    # advance BOTH watermarks far past 10:10 + 30min slack (the global
    # watermark is the MIN across inputs), then one more batch so the
    # evicted state emits the outer row; the late trigger uses another
    # user so it cannot match and stays buffered
    _write_file(
        spark, [("imp", "2024-01-01 13:00:00", 5, 8)], trig_stage,
        "b2.parquet",
    )
    _write_file(
        spark, [("click", "2024-01-01 13:00:00", 101, 9)], out_stage,
        "b2.parquet",
    )
    _write_file(
        spark, [("click", "2024-01-01 13:00:05", 102, 9)], out_stage,
        "b3.parquet",
    )
    run()
    rows = spark.read.parquet(sink_dir).collect()
    assert [(r.trigger_event_id, r.outcome_event_id, r.matched)
            for r in rows] == [(1, None, False)]
