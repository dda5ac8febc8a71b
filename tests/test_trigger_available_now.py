"""Trigger.AvailableNow: drain-all-then-stop batch-over-stream mode —
the modern replacement for Trigger.Once, still rate-limited per batch."""

from __future__ import annotations

import os

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.sources.envelope import envelope_from_events
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.source import (
    read_envelope_stream,
    stage_envelope_files,
)


def test_available_now_drains_everything_and_stops(spark, sf_dir, tmp_path):
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(500)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=5)
    out = str(tmp_path / "out")

    stream = read_envelope_stream(spark, stage, max_batches_per_trigger=1)
    decoded = replication.with_decoded(stream)
    q = (
        decoded.select("streamName", "sequenceNumber")
        .writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "wal"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive  # drained and self-stopped
    got = spark.read.parquet(os.path.join(out, "data"))
    assert got.count() == 500
    assert got.select("sequenceNumber").distinct().count() == 500
