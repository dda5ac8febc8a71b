"""EventTimeTimeout state expiry: sessions close (and their state is
removed) when the watermark passes last-event + gap."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    expiring_user_sessions,
)


def test_sessions_close_on_watermark(spark, tmp_path):
    # batch 0: users 1,2 at t0.  batch 1: user 1 again at t0+1m (keeps
    # its session open), plus user 99 far in the future (t0+2h) which
    # drags the watermark past everyone's gap.  batch 2: another future
    # event advances the watermark again so batch-1 state also expires.
    rows = [
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:00:30"),
        (1, "2024-01-01 00:01:00"),
        (99, "2024-01-01 02:00:00"),
        (99, "2024-01-01 04:00:00"),
    ]
    batches = [rows[:2], rows[2:4], rows[4:]]
    stage = str(tmp_path / "ev")
    os.makedirs(stage, exist_ok=True)
    for i, chunk in enumerate(batches):
        values = ", ".join(
            f"({u}L, TIMESTAMP '{t}')" for u, t in chunk
        )
        df = spark.sql(f"SELECT * FROM VALUES {values} AS t(user_id, ts)")
        tmp = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage, f"b{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    schema = "user_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        expiring_user_sessions(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    closed = {
        r.user_id: (r.n_events, r.closed)
        for r in spark.sql(
            "SELECT * FROM sessions WHERE closed"
        ).collect()
    }
    # users 1 and 2 must have expired with their full counts; user 1's
    # session merged both its events before closing
    assert closed[1] == (2, True)
    assert closed[2] == (1, True)
    # open (progress) emissions also appeared for the live sessions
    n_open = spark.sql("SELECT count(*) AS n FROM sessions WHERE NOT closed").collect()[0].n
    assert n_open >= 3
