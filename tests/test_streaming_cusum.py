"""Streaming CUSUM change detection: a stable value stream must not
alarm; a sustained upward shift must accumulate drift and alarm, with
state carried across micro-batches."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    streaming_cusum_alerts,
)

SCHEMA = "event_type string, ts timestamp, event_id long, value double"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(f"SELECT * FROM VALUES {rows_sql} AS t(event_type, ts, event_id, value)")
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(kind, start_id, base_val, n=20):
    return ", ".join(
        f"('{kind}', TIMESTAMP '2024-01-01 10:{i:02d}:00', {start_id + i}, "
        f"CAST({base_val} AS DOUBLE))"
        for i in range(n)
    )


def test_cusum_alarms_on_sustained_shift_only(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # batch 1: stable around 100 for both streams
    _write_file(
        spark,
        _rows("stable", 0, 100) + ", " + _rows("shifty", 1000, 100),
        stage,
        "b1.parquet",
    )
    # batch 2: 'shifty' jumps to 400 (+300 >> slack 5), 'stable' stays
    _write_file(
        spark,
        _rows("stable", 100, 100) + ", " + _rows("shifty", 1100, 400),
        stage,
        "b2.parquet",
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_cusum_alerts(stream)
        .writeStream.format("memory")
        .queryName("cusum_out")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    rows = spark.sql("SELECT * FROM cusum_out").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    # stable stream: never alarms, mean stays 100.00
    assert all(not r.alarm for r in by_type["stable"])
    assert all(r.mean_cents == 10000 for r in by_type["stable"])
    # shifty stream: no alarm while stable, alarm after the shift batch
    shifty = sorted(by_type["shifty"], key=lambda r: r.n_seen)
    assert not shifty[0].alarm
    assert shifty[-1].alarm
    # 20 values +300 above mean accumulate ~ (30000-ish) > 20000 cents
    assert shifty[-1].cusum_cents >= 20000
    assert shifty[-1].n_seen == 40  # state carried across batches


def test_cusum_state_survives_restart(spark, tmp_path):
    """Kill the query between batches and restart on the SAME WAL: the
    state store must restore (n, sum, cusum) so n_seen keeps counting
    from where it left off instead of restarting at 20."""
    stage = str(tmp_path / "stage")
    _write_file(spark, _rows("s1", 0, 100), stage, "b1.parquet")

    out_dir = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        # file sink, not memory: only durable sinks support restart
        # recovery from a checkpointLocation
        q = (
            streaming_cusum_alerts(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "wal"))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_once()  # processes b1, then stops
    _write_file(spark, _rows("s1", 100, 100), stage, "b2.parquet")
    run_once()  # restart: must resume state, process only b2
    rows = sorted(
        spark.read.parquet(out_dir).collect(), key=lambda r: r.n_seen
    )
    assert rows[-1].n_seen == 40, "state was not restored across restart"
    assert rows[-1].mean_cents == 10000
    assert not rows[-1].alarm


def test_cusum_negative_values_use_floor_cents(spark, tmp_path):
    """Cents conversion must FLOOR (round toward -inf), matching the
    repo-wide floor(value*100) convention — a plain int64 cast truncates
    toward zero and would put the streaming monitor 1 cent above the
    batch drift monitor on every negative sample."""
    stage = str(tmp_path / "stage")
    _write_file(
        spark,
        ", ".join(
            f"('neg', TIMESTAMP '2024-01-01 10:{i:02d}:00', {i}, "
            f"CAST(-0.015 AS DOUBLE))"
            for i in range(4)
        ),
        stage,
        "b1.parquet",
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_cusum_alerts(stream)
        .writeStream.format("memory")
        .queryName("cusum_neg")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    (row,) = spark.sql("SELECT * FROM cusum_neg").collect()
    # floor(-1.5) = -2; truncation would give -1
    assert row.mean_cents == -2
    assert not row.alarm
