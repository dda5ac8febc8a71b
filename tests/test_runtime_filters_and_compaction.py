"""Scale-path plan features: runtime Bloom-filter join pruning, and the
small-file compaction job that follows a streaming ingest (re-layout
with the Z-order writer)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.operators.layout import write_zordered
from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    CURRENT_REGION,
    _config_df,
)
from aws_kinesis_data_streams_replicator_spark.sources.envelope import (
    envelope_from_events,
)
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    run_replication_stream,
)
from aws_kinesis_data_streams_replicator_spark.streaming.source import (
    read_envelope_stream,
    stage_envelope_files,
)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir, tmp_path):
    """With the runtime-filter thresholds opened up, a fact⨝selective-dim
    join must inject bloom_filter_might_contain on the fact side — the
    mechanism that skips fact row groups at 100 TB."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep a shuffle join
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 2)
        joined = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_brand").count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
        # and it still computes the right thing
        want = (
            li.join(p.hint("broadcast"), li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_streaming_ingest_then_zorder_compaction(spark, sf_dir, tmp_path):
    """The lifecycle a real table lives: micro-batch ingest leaves many
    small files; the compaction job rewrites them Z-ordered; row count
    and content survive, file count drops."""
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(800)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=8)
    repl_dir = str(tmp_path / "repl")
    q = run_replication_stream(
        read_envelope_stream(spark, stage, max_batches_per_trigger=1),
        _config_df(spark),
        CURRENT_REGION,
        replicated_dir=repl_dir,
        checkpoint_table_dir=str(tmp_path / "cp"),
        stream_checkpoint_dir=str(tmp_path / "wal"),
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    small = glob.glob(os.path.join(repl_dir, "**", "*.parquet"), recursive=True)
    assert len(small) >= 8, "ingest should have left one file set per batch"
    ingested = spark.read.parquet(repl_dir)
    n, ksum = ingested.count(), ingested.agg(
        F.sum(F.col("sequenceNumber").cast("long"))
    ).first()[0]

    compact_dir = str(tmp_path / "compact")
    write_zordered(
        ingested.withColumn("_pk", F.col("partitionKey").cast("long")).withColumn(
            "_seq", F.col("sequenceNumber").cast("long")
        ),
        compact_dir,
        "_pk",
        "_seq",
        n_files=4,
        bits=8,
    )
    out_files = glob.glob(os.path.join(compact_dir, "*.parquet"))
    assert 0 < len(out_files) <= 4 < len(small)
    compacted = spark.read.parquet(compact_dir)
    assert compacted.count() == n
    assert compacted.agg(F.sum("_seq")).first()[0] == ksum
