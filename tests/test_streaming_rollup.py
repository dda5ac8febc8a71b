"""Streaming incremental rollup maintenance: merged partials must equal
the batch recompute, and a replayed micro-batch must not double-count."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    read_rollup,
    streaming_rollup_maintenance,
)


def _stage(events, stage: str, n: int) -> None:
    os.makedirs(stage, exist_ok=True)
    chunks = []
    per = events.count() // n
    prev = events.limit(0)
    for i in range(n):
        cur = events.limit((i + 1) * per) if i < n - 1 else events
        chunks.append(cur.subtract(prev))
        prev = cur
    for i, part in enumerate(chunks):
        tmp = tempfile.mkdtemp()
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage, f"b{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)


def _expected(events):
    return {
        r.event_type: (r.n, r.s, r.m)
        for r in events.select(
            "event_type",
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.max("cents").cast("long").alias("m"),
        )
        .collect()
    }


def test_rollup_maintenance_equals_batch_and_replay_safe(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(600)
    stage = str(tmp_path / "ev")
    _stage(events, stage, 3)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    rollup_dir = str(tmp_path / "rollup")
    q = streaming_rollup_maintenance(stream, rollup_dir, str(tmp_path / "wal"))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = {
        r.key: (r.n_events, r.sum_cents, r.max_cents)
        for r in read_rollup(spark, rollup_dir).collect()
    }
    assert got == _expected(events)

    # replay safety: restarting the stream against the same WAL must
    # leave the rollup byte-identical — version naming pins each merge
    # to the same predecessor, so nothing double-counts
    import re

    versions = sorted(
        int(m.group(1))
        for name in os.listdir(rollup_dir)
        if (m := re.fullmatch(r"v(\d+)", name))
    )
    q2 = streaming_rollup_maintenance(
        (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        ),
        rollup_dir,
        str(tmp_path / "wal"),
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    got2 = {
        r.key: (r.n_events, r.sum_cents, r.max_cents)
        for r in read_rollup(spark, rollup_dir).collect()
    }
    assert got2 == got
    versions2 = sorted(
        int(m.group(1))
        for name in os.listdir(rollup_dir)
        if (m := re.fullmatch(r"v(\d+)", name))
    )
    assert versions2 == versions  # no phantom versions from the restart


def test_read_rollup_none_before_first_batch(spark, tmp_path):
    assert read_rollup(spark, str(tmp_path / "nonexistent")) is None
