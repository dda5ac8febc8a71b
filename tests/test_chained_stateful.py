"""Chained stateful operators: two windowed aggregations in ONE
streaming query (streaming/job.py chained_window_rollup_stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    chained_window_rollup_stream,
)


def test_chained_rollup_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(3000)
    stage = str(tmp_path / "stage")
    events.write.parquet(stage)
    stream = spark.readStream.schema(events.schema).parquet(stage)

    out = chained_window_rollup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("chained_rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.n_fine_windows)
        for r in spark.sql("SELECT * FROM chained_rollup").collect()
    }
    # batch ground truth, restricted to coarse windows the watermark
    # closed (append mode emits only finalized windows)
    fine = events.groupBy(
        F.window("ts", "5 minutes").alias("w5"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_fine"))
    coarse = (
        fine.groupBy(
            F.window(F.window_time("w5"), "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.sum("n_fine").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_fine_windows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_fine_windows",
        )
    )
    want_all = {
        (str(r.window_start), r.event_type): (r.n_events, r.n_fine_windows)
        for r in coarse.collect()
    }
    assert got, "no finalized windows emitted"
    # every emitted (finalized) window must match the batch ground truth
    for key, val in got.items():
        assert want_all.get(key) == val, (key, val, want_all.get(key))
