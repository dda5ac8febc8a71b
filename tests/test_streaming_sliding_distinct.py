"""Sliding-window streaming distinct
(streaming/stateful.py:streaming_sliding_distinct): the emitted
estimate must track the exact distinct count of the 6-hour window
ending at the latest hour, state must stay bounded at ≤ 6 hours per
key under hour advancement (the eviction contract), and the register
fold must be replay-idempotent."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    _HLL_M,
    _SLIDING_HLL_W,
    _hll_estimate,
    _hll_fold,
    streaming_sliding_distinct,
)

SCHEMA = "event_type string, eh long, user_id long"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} AS t(event_type, eh, user_id)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(eh, ids):
    return ", ".join(f"('d', {eh}, {i})" for i in ids)


def _run(spark, stage, wal, query_name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_sliding_distinct(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", wal)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def test_window_estimate_and_eviction(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # batch 1: hour 100 (users 0..799) — window = {100}, 800 distinct
    _write_file(spark, _rows(100, range(0, 800)), stage, "b1.parquet")
    # batch 2: hour 103 (users 400..1199, half overlap) — window =
    # {100, 103}: exact union 1200 distinct
    _write_file(spark, _rows(103, range(400, 1200)), stage, "b2.parquet")
    # batch 3: hour 120 — far jump: hours 100/103 must be EVICTED,
    # window = {120} with 300 distinct
    _write_file(spark, _rows(120, range(0, 300)), stage, "b3.parquet")
    rows = sorted(
        _run(spark, stage, str(tmp_path / "wal"), "shll_out"),
        key=lambda r: r.window_end_eh,
    )
    assert [r.window_end_eh for r in rows] == [100, 103, 120]
    for r, exact in zip(rows, (800, 1200, 300)):
        assert abs(r.est_distinct_window - exact) <= exact * 0.20, (
            r.est_distinct_window,
            exact,
        )
    assert [r.n_hours_merged for r in rows] == [1, 2, 1]
    # the eviction contract: never more than W hours of state
    assert all(r.n_state_hours <= _SLIDING_HLL_W for r in rows)
    assert rows[-1].n_state_hours == 1


def test_register_fold_is_replay_idempotent():
    regs = [0] * _HLL_M
    _hll_fold(regs, range(1000))
    once = list(regs)
    _hll_fold(regs, range(1000))  # at-least-once replay
    assert regs == once
    assert _hll_estimate(regs) == _hll_estimate(once)
