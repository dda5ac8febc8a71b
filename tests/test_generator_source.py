"""The kds_generator Python DataSource: determinism, batch/stream parity,
and the full replication pipeline over a generated stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.sources.generator import register
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    read_checkpoint_table,
    run_replication_stream,
)


def _gen(spark, **opts):
    register(spark)
    r = spark.read.format("kds_generator")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_generation_is_deterministic(spark):
    a = sorted(map(tuple, _gen(spark, rows=200, seed=7).collect()))
    b = sorted(map(tuple, _gen(spark, rows=200, seed=7).collect()))
    c = sorted(map(tuple, _gen(spark, rows=200, seed=8).collect()))
    assert a == b
    assert a != c
    assert len(a) == 200
    # CDC payload template shape (README.md:120-125)
    import json

    payload = json.loads(bytes(a[0][4]))
    assert set(payload) == {"key", "commitTimestamp"}
    assert 0 <= payload["key"] < 10_000_000_000


def test_stream_equals_batch_and_pipeline_runs(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.format("kds_generator")
        .option("rowsPerBatch", 150)
        .option("maxRows", 600)
        .load()
    )
    cfg = spark.sql(
        "SELECT * FROM VALUES ('kds-click','us-east-1'), ('kds-view','US-EAST-1') "
        "AS t(streamName, activeRegion)"
    )
    q = run_replication_stream(
        stream,
        cfg,
        "us-east-1",
        replicated_dir=os.path.join(out, "repl"),
        checkpoint_table_dir=os.path.join(out, "cp"),
        stream_checkpoint_dir=os.path.join(out, "wal"),
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = spark.read.parquet(os.path.join(out, "repl"))
    want = replication.replicated_records(
        replication.gate_active_region(
            replication.with_decoded(_gen(spark, rows=600)), cfg, "us-east-1"
        )
    )
    assert got.count() == want.count() > 0
    assert got.select("sequenceNumber").subtract(want.select("sequenceNumber")).count() == 0
    cp = read_checkpoint_table(spark, os.path.join(out, "cp"))
    want_cp = {
        r.streamName: r.lastReplicatedCommitTimestamp
        for r in replication.checkpoint(
            replication.gate_active_region(
                replication.with_decoded(_gen(spark, rows=600)), cfg, "us-east-1"
            )
        ).collect()
    }
    assert {
        r.streamName: r.lastReplicatedCommitTimestamp for r in cp.collect()
    } == want_cp
