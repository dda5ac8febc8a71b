"""Median-keyed drift detection
(streaming/stateful.py:streaming_median_drift): a sustained median
shift alarms after two consecutive shifted batches; a batch of extreme
OUTLIERS that leaves the median in place must NOT alarm — the
robustness property the mean-keyed CUSUM cannot provide."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    streaming_median_drift,
)

SCHEMA = "event_type string, ts timestamp, event_id long, value double"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} "
        "AS t(event_type, ts, event_id, value)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(kind, start_id, values):
    return ", ".join(
        f"('{kind}', TIMESTAMP '2024-01-01 10:00:00', {start_id + i}, "
        f"CAST({v} AS DOUBLE))"
        for i, v in enumerate(values)
    )


def _run(spark, stage, wal, qname):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_median_drift(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", wal)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return sorted(
        spark.sql(f"SELECT * FROM {qname}").collect(),
        key=lambda r: (r.event_type, r.n_seen),
    )


def test_sustained_shift_alarms_outliers_do_not(spark, tmp_path):
    stage = str(tmp_path / "stage")
    base = [100] * 20
    # 'shift': 4 batches — stable, stable, shifted, shifted (sustained)
    # 'spike': stable, then 5 outliers at 100x among 20 normal values
    # (mean jumps ~5x; the median does not move), twice
    _write_file(
        spark,
        _rows("shift", 0, base) + ", " + _rows("spike", 5000, base),
        stage,
        "b1.parquet",
    )
    _write_file(
        spark,
        _rows("shift", 100, base)
        + ", "
        + _rows("spike", 5100, [10000] * 5 + [100] * 15),
        stage,
        "b2.parquet",
    )
    _write_file(
        spark,
        _rows("shift", 200, [400] * 20)
        + ", "
        + _rows("spike", 5200, [10000] * 5 + [100] * 15),
        stage,
        "b3.parquet",
    )
    _write_file(spark, _rows("shift", 300, [400] * 20), stage, "b4.parquet")
    rows = _run(spark, stage, str(tmp_path / "wal"), "mdrift_out")
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append(r)
    shift = by["shift"]
    # batch order: stable, stable, first shifted batch (no alarm yet),
    # second shifted batch (sustained → alarm)
    assert [r.alarm for r in shift] == [False, False, False, True]
    assert shift[2].shift_cents > 5000 and shift[3].shift_cents > 5000
    # outlier stream: median never moves beyond threshold → no alarm,
    # even though 25% of values are 100× the base
    spike = by["spike"]
    assert all(not r.alarm for r in spike)
    assert all(r.shift_cents <= 5000 for r in spike)


def test_drift_state_survives_restart(spark, tmp_path):
    """A shift straddling a restart must still alarm: batch 1 (stable)
    and batch 2 (first shifted batch) run in query 1; query 2 restores
    the summary AND the consecutive-shift counter from the WAL, so
    batch 3 (second shifted batch) alarms immediately."""
    stage = str(tmp_path / "stage")
    wal = str(tmp_path / "wal")
    out = str(tmp_path / "out")
    base = [100] * 20

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            streaming_median_drift(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", wal)
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    _write_file(spark, _rows("m", 0, base), stage, "b1.parquet")
    _write_file(spark, _rows("m", 100, [400] * 20), stage, "b2.parquet")
    run_once()
    _write_file(spark, _rows("m", 200, [400] * 20), stage, "b3.parquet")
    run_once()
    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.n_seen
    )
    assert [r.alarm for r in rows] == [False, False, True]
    assert rows[-1].n_shifted_batches == 2
