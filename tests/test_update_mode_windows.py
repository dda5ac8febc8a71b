"""Update-mode windowed aggregation: windows re-emit as new data
arrives; the latest emission per window equals the batch answer."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import windows
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    windowed_counts_stream,
)


def test_update_mode_latest_emission_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(600)
    stage = str(tmp_path / "ev")
    os.makedirs(stage, exist_ok=True)
    # two files → two micro-batches → overlapping windows re-emit
    for i, part in enumerate([events.limit(300), events.subtract(events.limit(300))]):
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
    q = (
        windowed_counts_stream(stream, watermark_delay="100 days", size="1 hour")
        .withColumn("window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"))
        .writeStream.format("memory")
        .queryName("upd_win")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql(
            """
            SELECT * FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY window_start, event_type
                  ORDER BY n_events DESC) rk
              FROM upd_win
            ) WHERE rk = 1
            """
        ).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windows.tumbling(events, "1 hour").collect()
    }
    assert got == want
