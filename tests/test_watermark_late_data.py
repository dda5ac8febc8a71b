"""Watermark + late-data semantics (the reference has none — SURVEY
§2.2): rows older than the watermark are dropped from windowed results."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    windowed_counts_stream,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _stage_one_file(spark, rows, stage_dir, name):
    vals = ", ".join(
        f"({i}, TIMESTAMP '{ts}', 1, '{et}', 1.0, '{{}}')" for i, (ts, et) in enumerate(rows)
    )
    df = spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(event_id, ts, user_id, event_type, value, props)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage_dir, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # batch 1: two rows in the 10:00 window, one at 12:00 → watermark
    # advances to 11:30 (30 min delay), closing and emitting 10:00-11:00.
    _stage_one_file(
        spark,
        [("2024-01-01 10:00:00", "click"), ("2024-01-01 10:10:00", "click"),
         ("2024-01-01 12:00:00", "click")],
        stage,
        "b0.parquet",
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        windowed_counts_stream(stream, watermark_delay="30 minutes", size="1 hour")
        .writeStream.format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()

    # batch 2: a LATE row for the already-closed 10:00 window
    _stage_one_file(spark, [("2024-01-01 10:20:00", "click")], stage, "b1.parquet")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    rows = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # 10:00 window emitted with the 2 on-time rows; the late third row
    # was dropped, and the still-open 12:00 window has emitted nothing.
    assert rows == {("2024-01-01 10:00:00", "click"): 2}
