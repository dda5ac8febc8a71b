"""Deterministic KLL-style streaming median
(streaming/stateful.py:streaming_quantile_kll): multi-level summary
whose rank-error budget grows logarithmically per item instead of the
single-level sketch's linear-per-epoch growth, with WAL-restorable
state and exact weighted inserts via binary decomposition."""

from __future__ import annotations

import glob
import math
import os
import shutil
import tempfile

import pandas as pd

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    _KLL_LEVEL_CAP,
    _kll_update,
    _qsketch_update,
    streaming_quantile_kll,
)

SCHEMA = "event_type string, ts timestamp, event_id long, value double"


class _StubState:
    """Minimal GroupState stand-in for driving the update functions
    without a streaming query: .exists/.get/.update only."""

    def __init__(self):
        self.exists = False
        self._tuple = None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = t
        self.exists = True


def _feed(update_fn, state, values):
    (out,) = list(
        update_fn(
            ("k",),
            [pd.DataFrame({"value": [float(v) for v in values]})],
            state,
        )
    )
    return out.iloc[0]


def test_kll_budget_sublinear_vs_single_level():
    """The headline property: over many batches the KLL budget stays
    within the (n/C)·log2(n/C) analysis and far under the single-level
    sketch's budget, which crosses n/2 (vacuous) on the same input."""
    kll, eqd = _StubState(), _StubState()
    n = 0
    for t in range(200):
        batch = list(range(t * 500, t * 500 + 500))
        r_kll = _feed(_kll_update, kll, batch)
        r_eqd = _feed(_qsketch_update, eqd, batch)
        n += 500
    assert r_kll["n_seen"] == r_eqd["n_seen"] == n == 100_000
    C = _KLL_LEVEL_CAP
    analytic = (n / C) * math.log2(n / C)
    assert 0 < r_kll["rank_err_bound"] <= analytic
    # single-level: vacuous on this stream; KLL: a usable guarantee
    assert r_eqd["rank_err_bound"] > n / 2
    assert r_kll["rank_err_bound"] < n / 10
    # and the estimate really is within the budget of the true median
    # (values are distinct integers·100 cents, so cent error / 100 =
    # rank error on the value grid)
    true_med_cents = ((n - 1) // 2) * 100
    assert (
        abs(r_kll["est_p50_cents"] - true_med_cents)
        <= (r_kll["rank_err_bound"] + 1) * 100
    )


def test_kll_weighted_insert_is_exact():
    """A value seen c times enters as the binary decomposition of c:
    no compaction, zero budget, exact median, summary ≤ popcount
    items per distinct value."""
    st = _StubState()
    r = _feed(_kll_update, st, [7.0] * 5 + [9.0] * 3 + [11.0] * 2)
    assert r["rank_err_bound"] == 0
    assert r["est_p50_cents"] == 700  # ranks 1-5 of 10 are 7.00
    assert r["summary_size"] == 2 + 2 + 1  # popcounts of 5, 3, 2
    assert r["n_seen"] == 10


def test_kll_replay_is_deterministic():
    """Derandomized compaction: replaying the identical batches yields
    bit-identical state tuples (the WAL-replay property randomized KLL
    gives up)."""
    a, b = _StubState(), _StubState()
    for t in range(40):
        batch = [(v * 37) % 1000 for v in range(t * 100, t * 100 + 100)]
        _feed(_kll_update, a, batch)
        _feed(_kll_update, b, batch)
    assert a.get == b.get
    # and compaction actually happened (parities flipped somewhere)
    assert any(p == 1 for p in a.get[4]) or a.get[3] > 0


def test_kll_levels_bounded_logarithmically():
    st = _StubState()
    for t in range(100):
        _feed(_kll_update, st, range(t * 1000, t * 1000 + 1000))
    r = _feed(_kll_update, st, [0.0])
    n = r["n_seen"]
    # state is O(C · levels); levels ≈ log2(n/C)
    assert r["n_levels"] <= math.log2(n / _KLL_LEVEL_CAP) + 2
    assert r["summary_size"] <= _KLL_LEVEL_CAP * r["n_levels"] + 1


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


def test_kll_stream_restart_resumes_state(spark, tmp_path):
    """End-to-end through a real streaming query: the multi-level
    state round-trips the WAL (flattened vals/lvls/parities arrays)
    and a restarted query's estimate reflects both batches."""
    stage = str(tmp_path / "stage")
    wal = str(tmp_path / "wal")
    out = str(tmp_path / "out")
    _write_file(spark, _rows("m", 0, range(1, 101)), stage, "b1.parquet")

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            streaming_quantile_kll(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", wal)
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_once()
    _write_file(spark, _rows("m", 1000, range(101, 301)), stage, "b2.parquet")
    run_once()
    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.n_seen
    )
    assert [r.n_seen for r in rows] == [100, 300]
    b1, b2 = rows
    # exact medians: 50.00 of 1..100, 150.00 of 1..300 (cents; the
    # 100-cent value grid turns rank error into ≤100·err cents)
    assert abs(b1.est_p50_cents - 5000) <= 100 * (b1.rank_err_bound + 1)
    assert abs(b2.est_p50_cents - 15000) <= 100 * (b2.rank_err_bound + 1)
    assert b2.est_p50_cents > 10000  # state really restored from WAL
