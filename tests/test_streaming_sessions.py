"""Streaming session windows — the streaming twin of
operators/windows.sessionize.

Session-window streaming aggregation only supports APPEND output mode
(update raises STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION): a session
is emitted once, when the watermark passes its end.  Sessions still open
at the final watermark are withheld — the batch comparison below models
exactly that.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import windows
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table


def test_streaming_session_windows_match_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(400)
    stage = str(tmp_path / "ev")
    tmp = tempfile.mkdtemp()
    events.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, "all.parquet"))

    stream = spark.readStream.schema(events.schema).parquet(stage)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window(F.col("ts"), "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stream")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }

    # batch truth, restricted to sessions the watermark had closed:
    # final watermark = max(ts) - 1h delay
    max_ts = events.agg(F.max("ts").alias("m")).first().m
    batch = windows.sessionize(events, "10 minutes")
    closed = batch.where(
        F.to_timestamp(F.col("session_end"))
        < F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
    )
    want = {
        (r.user_id, r.session_start): r.n_events for r in closed.collect()
    }
    assert got == want
    assert len(got) > 0
