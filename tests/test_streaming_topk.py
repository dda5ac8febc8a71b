"""Streaming top-k per window (Q18-on-a-stream): the update-mode agg +
foreachBatch merge-rank recipe must equal the batch answer."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import Window, functions as F

from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    topk_users_per_window_stream,
)


def test_streamed_topk_equals_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(600)
    stage = str(tmp_path / "ev")
    os.makedirs(stage, exist_ok=True)
    # 3 files → 3 micro-batches → windows update across batches, so the
    # foreachBatch merge path (not just the first write) is exercised
    chunks = [
        events.limit(200),
        events.limit(400).subtract(events.limit(200)),
        events.subtract(events.limit(400)),
    ]
    for i, part in enumerate(chunks):
        tmp = tempfile.mkdtemp()
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage, f"b{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = str(tmp_path / "topk")
    q = topk_users_per_window_stream(
        stream, out, str(tmp_path / "wal"), k=3, watermark_delay="100 days"
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = {
        (r.window_start, r.rnk): (r.user_id, r.n_events)
        # partition-column type inference parses the string back to a
        # timestamp — cast to string to compare against the batch side
        for r in spark.read.parquet(out)
        .withColumn("window_start", F.col("window_start").cast("string"))
        .collect()
    }

    win = (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "user_id",
            "n_events",
        )
    )
    rw = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    want = {
        (r.window_start, r.rnk): (r.user_id, r.n_events)
        for r in win.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= 3)
        .collect()
    }
    assert got == want


def test_topk_stream_restart_is_idempotent(spark, sf_dir, tmp_path):
    """Kill the top-k stream between micro-batches and restart from the
    WAL: dynamic partition overwrite + monotone merge must land on the
    same final answer (no dup rows, no lost windows)."""
    events = load_table(spark, sf_dir, "events").limit(400)
    stage = str(tmp_path / "ev")
    os.makedirs(stage, exist_ok=True)
    for i, part in enumerate(
        [events.limit(200), events.subtract(events.limit(200))]
    ):
        tmp = tempfile.mkdtemp()
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage, f"b{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    out, wal = str(tmp_path / "topk"), str(tmp_path / "wal")

    def start():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return topk_users_per_window_stream(
            stream, out, wal, k=3, watermark_delay="100 days"
        )

    # run once to completion, snapshot, then restart (replays nothing
    # new) and snapshot again — identical tables
    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    first = {
        (str(r.window_start), r.rnk): (r.user_id, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    second = {
        (str(r.window_start), r.rnk): (r.user_id, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    assert first == second and len(first) > 0
