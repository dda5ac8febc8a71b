"""Structured Streaming wrap: end-to-end replication, restart/resume
(op 9), idempotent checkpoint upsert, dead-lettering, streaming dedup."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.sources.envelope import envelope_from_events
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.listener import (
    ReplicationMetricsListener,
)
from aws_kinesis_data_streams_replicator_spark.streaming.sinks import upsert_checkpoint
from aws_kinesis_data_streams_replicator_spark.streaming.source import (
    read_envelope_stream,
    stage_envelope_files,
)
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    read_checkpoint_table,
    run_replication_stream,
    streaming_dedup,
)

CONFIG = [
    ("kds-click", "us-east-1"),
    ("kds-view", "US-EAST-1"),
    ("kds-purchase", "eu-west-1"),
]


def _config_df(spark):
    vals = ", ".join(f"('{s}', '{r}')" for s, r in CONFIG)
    return spark.sql(f"SELECT * FROM VALUES {vals} AS t(streamName, activeRegion)")


@pytest.fixture(scope="module")
def envelope(spark, sf_dir):
    return envelope_from_events(load_table(spark, sf_dir, "events"))


def _run_to_completion(spark, stage_dir, out, cfg, listener=None):
    stream = read_envelope_stream(spark, stage_dir, max_batches_per_trigger=1)
    q = run_replication_stream(
        stream,
        cfg,
        "us-east-1",
        replicated_dir=os.path.join(out, "replicated"),
        checkpoint_table_dir=os.path.join(out, "checkpoint_table"),
        stream_checkpoint_dir=os.path.join(out, "wal"),
        dead_letter_dir=os.path.join(out, "dead_letter"),
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return q


def test_stream_matches_batch_pipeline(spark, envelope, tmp_path):
    """The incremental run must produce exactly the batch-mode answer."""
    out = str(tmp_path / "out")
    stage = str(tmp_path / "stage")
    listener = ReplicationMetricsListener()
    spark.streams.addListener(listener)
    try:
        stage_envelope_files(envelope, stage, n_files=4)
        _run_to_completion(spark, stage, out, _config_df(spark))
    finally:
        spark.streams.removeListener(listener)

    got = spark.read.parquet(os.path.join(out, "replicated"))
    want = replication.replicated_records(
        replication.gate_active_region(
            replication.with_decoded(envelope), _config_df(spark), "us-east-1"
        )
    )
    assert got.count() == want.count()
    assert got.select("sequenceNumber").subtract(want.select("sequenceNumber")).count() == 0

    cp = {
        r.streamName: r.lastReplicatedCommitTimestamp
        for r in read_checkpoint_table(spark, os.path.join(out, "checkpoint_table")).collect()
    }
    want_cp = {
        r.streamName: r.lastReplicatedCommitTimestamp
        for r in replication.checkpoint(
            replication.gate_active_region(
                replication.with_decoded(envelope), _config_df(spark), "us-east-1"
            )
        ).collect()
    }
    assert cp == want_cp
    # one metrics row per micro-batch, log contract fed by observe()
    assert len([m for m in listener.metrics if m["n_records"]]) >= 1


def test_restart_resumes_without_loss_or_dup(spark, envelope, tmp_path):
    """Kill-and-restart from checkpointLocation (op 9): prefix processed
    before the stop is not reprocessed; everything arrives exactly once
    in the file-source case (at-least-once in general)."""
    out = str(tmp_path / "out")
    stage = str(tmp_path / "stage")
    half = envelope.limit(400)
    stage_envelope_files(half, stage, n_files=2)
    _run_to_completion(spark, stage, out, _config_df(spark))
    n_first = spark.read.parquet(os.path.join(out, "replicated")).count()
    assert n_first > 0

    # new envelope files arrive while the query is down
    rest = envelope.subtract(half)
    import glob

    existing = len(glob.glob(os.path.join(stage, "batch_*.parquet")))
    more = stage_envelope_files(rest, str(tmp_path / "stage2"), n_files=2)
    for i, p in enumerate(more):
        os.rename(p, os.path.join(stage, f"batch_{existing + i:05d}.parquet"))

    _run_to_completion(spark, stage, out, _config_df(spark))
    got = spark.read.parquet(os.path.join(out, "replicated"))
    want = replication.replicated_records(
        replication.gate_active_region(
            replication.with_decoded(envelope), _config_df(spark), "us-east-1"
        )
    )
    # exactly-once for the file source: no loss, no duplicates
    assert got.count() == want.count()
    assert got.select("sequenceNumber").distinct().count() == got.count()


def test_checkpoint_upsert_is_idempotent_and_monotone(spark, tmp_path):
    table = str(tmp_path / "cp")

    def cp_df(rows):
        vals = ", ".join(f"('{s}', '{t}')" for s, t in rows)
        return spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(streamName, lastReplicatedCommitTimestamp)"
        )

    upsert_checkpoint(cp_df([("s1", "2024-01-01T00:00:05Z")]), table)
    upsert_checkpoint(cp_df([("s1", "2024-01-01T00:00:09Z"), ("s2", "2024-01-01T00:00:01Z")]), table)
    # replay of an OLD batch (Lambda-style retry) must not move s1 backwards
    upsert_checkpoint(cp_df([("s1", "2024-01-01T00:00:05Z")]), table)
    got = {
        r.streamName: r.lastReplicatedCommitTimestamp
        for r in read_checkpoint_table(spark, table).collect()
    }
    assert got == {"s1": "2024-01-01T00:00:09Z", "s2": "2024-01-01T00:00:01Z"}


def test_checkpoint_crash_leaves_previous_version_readable(spark, tmp_path):
    """Kill between data write and pointer commit: the table must still
    read as the PREVIOUS state (no missing-table window)."""
    import os

    table = str(tmp_path / "cp")

    def cp_df(rows):
        vals = ", ".join(f"('{s}', '{t}')" for s, t in rows)
        return spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(streamName, lastReplicatedCommitTimestamp)"
        )

    upsert_checkpoint(cp_df([("s1", "2024-01-01T00:00:05Z")]), table)
    # simulate a crashed upsert: new version dir written, pointer NOT moved
    os.makedirs(os.path.join(table, "v99"), exist_ok=True)
    got = {
        r.streamName: r.lastReplicatedCommitTimestamp
        for r in read_checkpoint_table(spark, table).collect()
    }
    assert got == {"s1": "2024-01-01T00:00:05Z"}
    # recovery: the next successful upsert proceeds normally
    upsert_checkpoint(cp_df([("s1", "2024-01-01T00:00:07Z")]), table)
    got2 = {
        r.streamName: r.lastReplicatedCommitTimestamp
        for r in read_checkpoint_table(spark, table).collect()
    }
    assert got2 == {"s1": "2024-01-01T00:00:07Z"}


def test_malformed_payload_goes_to_dead_letter(spark, tmp_path):
    out = str(tmp_path / "out")
    stage = str(tmp_path / "stage")
    env = spark.sql(
        """
        SELECT * FROM VALUES
        ('arn:aws:kinesis:us-east-1:1:stream/kds-click/consumer/c:1', '1', '001',
         TIMESTAMP '2024-01-01 00:00:00', encode('{"key":1,"commitTimestamp":"2024-01-01T00:00:00Z"}', 'UTF-8')),
        ('arn:aws:kinesis:us-east-1:1:stream/kds-click/consumer/c:1', '2', '002',
         TIMESTAMP '2024-01-01 00:00:01', encode('corrupted-not-json', 'UTF-8'))
        AS t(eventSourceARN, partitionKey, sequenceNumber, approximateArrivalTimestamp, data)
        """
    )
    stage_envelope_files(env, stage, n_files=1)
    _run_to_completion(spark, stage, out, _config_df(spark))
    assert spark.read.parquet(os.path.join(out, "replicated")).count() == 1
    dl = spark.read.parquet(os.path.join(out, "dead_letter"))
    assert [r.sequenceNumber for r in dl.collect()] == ["002"]
    cp = read_checkpoint_table(spark, os.path.join(out, "checkpoint_table"))
    assert cp.first().lastReplicatedCommitTimestamp == "2024-01-01T00:00:00Z"


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a replayed events stream: a
    single micro-batch dedups fully → equals batch-mode distinct."""
    events = load_table(spark, sf_dir, "events")
    # duplicate every event once to force real dedup work
    doubled = events.unionAll(events)
    stage = str(tmp_path / "events_stage")
    from pyspark.sql.types import StructType

    stage_df = doubled.select(
        F.col("event_id"), F.col("ts"), F.col("user_id"), F.col("event_type"),
        F.col("value"), F.col("props"),
    )
    import glob as _glob
    import shutil, tempfile

    tmp = tempfile.mkdtemp()
    stage_df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, "all.parquet"))

    stream = spark.readStream.schema(stage_df.schema).parquet(stage)
    deduped = streaming_dedup(stream, ["event_id"], watermark_col="ts", delay="90 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n = spark.sql("SELECT count(*) c FROM dedup_out").first().c
    assert n == events.count()


def test_union_of_two_stream_sources_matches_batch(spark, envelope, tmp_path):
    """Multi-stream ingestion: two independent staged sources (as a real
    deployment has one Kinesis stream per event family) unioned into ONE
    streaming query with a single WAL.  The union must replicate exactly
    the batch answer over the combined input — offsets for both sources
    are tracked in the same checkpoint."""
    out = str(tmp_path / "out")
    stage_a, stage_b = str(tmp_path / "sa"), str(tmp_path / "sb")
    part_a = envelope.where(F.col("eventSourceARN").contains("kds-click"))
    part_b = envelope.where(~F.col("eventSourceARN").contains("kds-click"))
    stage_envelope_files(part_a, stage_a, n_files=2)
    stage_envelope_files(part_b, stage_b, n_files=3)

    sa = read_envelope_stream(spark, stage_a, max_batches_per_trigger=1)
    sb = read_envelope_stream(spark, stage_b, max_batches_per_trigger=1)
    q = run_replication_stream(
        sa.unionByName(sb),
        _config_df(spark),
        "us-east-1",
        replicated_dir=os.path.join(out, "replicated"),
        checkpoint_table_dir=os.path.join(out, "checkpoint_table"),
        stream_checkpoint_dir=os.path.join(out, "wal"),
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = spark.read.parquet(os.path.join(out, "replicated"))
    want = replication.replicated_records(
        replication.gate_active_region(
            replication.with_decoded(envelope), _config_df(spark), "us-east-1"
        )
    )
    assert got.count() == want.count()
    assert (
        got.select("sequenceNumber")
        .subtract(want.select("sequenceNumber"))
        .count()
        == 0
    )
