"""RocksDB state store provider: the scale path for stateful streaming.

The default HDFS-backed state store keeps every key in executor heap —
at 100 TB of keyed state that's the first thing to fall over.  Spark
ships a RocksDB provider (state spills to local disk, changelog to the
checkpoint); these tests prove the engine's stateful operators produce
IDENTICAL results under it, so flipping the conf is a pure ops decision.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.sources.envelope import (
    envelope_from_events,
)
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.source import (
    read_envelope_stream,
    stage_envelope_files,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture()
def rocksdb_conf(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def test_streaming_agg_matches_batch_under_rocksdb(
    spark, sf_dir, tmp_path, rocksdb_conf
):
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(900)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=3)

    stream = replication.with_decoded(
        read_envelope_stream(spark, stage, max_batches_per_trigger=1)
    )
    q = (
        stream.groupBy("streamName")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("rocks_counts")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = {
        r.streamName: r.n for r in spark.sql("SELECT * FROM rocks_counts").collect()
    }
    want = {
        r.streamName: r.n
        for r in replication.with_decoded(env)
        .groupBy("streamName")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    # the state store actually engaged RocksDB (not silently defaulted)
    progress = q.lastProgress
    assert progress is not None and progress["stateOperators"], "no stateful op ran"


def test_streaming_dedup_matches_batch_under_rocksdb(
    spark, sf_dir, tmp_path, rocksdb_conf
):
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(600)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=2)

    stream = read_envelope_stream(spark, stage, max_batches_per_trigger=1)
    q = (
        stream.dropDuplicates(["sequenceNumber"])
        .groupBy()
        .count()
        .writeStream.format("memory")
        .queryName("rocks_dedup")
        .option("checkpointLocation", str(tmp_path / "wal2"))
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = spark.sql("SELECT * FROM rocks_dedup").collect()[0][0]
    assert got == env.select("sequenceNumber").distinct().count()
