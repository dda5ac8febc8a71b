"""applyInPandasWithState: per-key state carried across micro-batches."""

from __future__ import annotations

import os

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.sources.envelope import envelope_from_events
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.source import (
    read_envelope_stream,
    stage_envelope_files,
)
from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    running_stream_totals,
)


def test_running_totals_accumulate_across_batches(spark, sf_dir, tmp_path):
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(600)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=3)

    stream = read_envelope_stream(spark, stage, max_batches_per_trigger=1)
    decoded = replication.with_decoded(stream)
    q = (
        running_stream_totals(decoded)
        .writeStream.format("memory")
        .queryName("totals")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    # update-mode memory sink keeps every emission; the LAST per stream
    # must equal the batch-mode totals, and n_batches must exceed 1 for
    # at least one stream (proving cross-batch state survival).
    rows = spark.sql(
        """
        SELECT streamName, total_records, last_commit_ts, n_batches
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY streamName ORDER BY n_batches DESC) AS rk
            FROM totals
        ) WHERE rk = 1
        """
    ).collect()
    got = {r.streamName: (r.total_records, r.last_commit_ts, r.n_batches) for r in rows}

    from pyspark.sql import functions as F

    want = {
        r.streamName: (r.n, r.last_ts)
        for r in replication.with_decoded(env)
        .groupBy("streamName")
        .agg(F.count("*").alias("n"), F.max("commitTimestamp").alias("last_ts"))
        .collect()
    }
    assert set(got) == set(want)
    for s, (n, last_ts) in want.items():
        assert got[s][0] == n, f"{s}: {got[s][0]} != {n}"
        assert got[s][1] == last_ts
    assert any(v[2] > 1 for v in got.values())
