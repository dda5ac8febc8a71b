"""State-store observability: the lastProgress stateOperators metrics a
100 TB operator watches (state row counts, memory, update rates) are
populated and numerically consistent with the data."""

from __future__ import annotations

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


def test_state_operator_metrics_match_key_cardinality(spark, sf_dir, tmp_path):
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
        .queryName("state_metrics")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()
    q.awaitTermination(30)

    n_keys = replication.with_decoded(env).select("streamName").distinct().count()

    assert progress is not None and progress["stateOperators"]
    op = progress["stateOperators"][0]
    # state holds exactly one row per aggregation key
    assert op["numRowsTotal"] == n_keys
    # the store reports real resource usage, not zeros
    assert op["memoryUsedBytes"] > 0
    # the final micro-batch updated at most |keys| rows
    assert 0 <= op["numRowsUpdated"] <= n_keys
    # a replay-capable provider is active and reports commit time
    assert "allUpdatesTimeMs" in op
