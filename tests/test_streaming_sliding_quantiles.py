"""Sliding-window streaming quantiles
(streaming/stateful.py:streaming_sliding_value_quantiles): the emitted
p50/p95 per window must equal the batch twin
(plans/queries.py:evt_sliding_loghist_quantiles) BIT-FOR-BIT — the
log-bucket histogram is a pure count structure over a deterministic
bucket function, so micro-batch boundaries cannot move the answer —
state must stay bounded at ≤ 6 hours per key under hour advancement,
and a WAL restart must neither double-count nor resurrect evicted
hours."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES
from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    _SLIDING_LOGQ_W,
    logbucket_id,
    logbucket_lo,
    streaming_sliding_value_quantiles,
)

SCHEMA = "event_type string, eh long, cents long"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} AS t(event_type, eh, cents)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(eh, cents_list):
    return ", ".join(f"('d', {eh}, {c})" for c in cents_list)


def _run(spark, stage, wal, out_dir):
    """foreachBatch parquet sink (the memory sink cannot recover from a
    checkpoint, and WAL restart is exactly what we test).  Returns only
    the rows emitted by THIS run."""
    before = set(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def sink(df, _bid):
        df.write.mode("append").parquet(out_dir)

    q = (
        streaming_sliding_value_quantiles(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", wal)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    new = [
        f
        for f in glob.glob(os.path.join(out_dir, "part-*.parquet"))
        if f not in before
    ]
    if not new:
        return []
    return spark.read.parquet(*new).collect()


def test_bucket_functions_are_the_sql_twins(spark):
    # the Python bucket must agree with the SQL expression the batch
    # twin uses (identity below 8; exponent + 2-bit mantissa) — same
    # ids for the same values, engine by engine
    assert [logbucket_id(v) for v in range(8)] == list(range(8))
    assert logbucket_id(-5) == 0
    assert logbucket_id(8) == 16  # 0b1000: e=4, m=(8>>1)&3=0
    vals = [0, 1, 7, 8, 9, 15, 16, 17, 100, 12345, 2**40 + 12345]
    got = spark.sql(
        "SELECT v, CASE WHEN v < 8 THEN v ELSE 4 * length(bin(v)) "
        "+ (shiftright(v, length(bin(v)) - 3) & 3) END AS bid "
        f"FROM VALUES {', '.join(f'(CAST({v} AS BIGINT))' for v in vals)} t(v) "
        "ORDER BY v"
    ).collect()
    assert [(r.v, r.bid) for r in got] == [(v, logbucket_id(v)) for v in vals]


def test_bucket_id_and_lo_roundtrip():
    for v in [0, 1, 7, 8, 9, 15, 16, 100, 12345, 10**6, 2**40 + 12345]:
        b = logbucket_id(v)
        lo = logbucket_lo(b)
        assert lo <= v, (v, b, lo)
        if v >= 8:
            # bucket width <= 25% of its lower bound
            assert v < lo + (lo >> 2) + 1 or logbucket_id(lo) == b
            assert logbucket_id(lo) == b


def test_streaming_matches_batch_twin_per_window(spark, tmp_path):
    stage = str(tmp_path / "stage")
    sf = str(tmp_path / "sf")
    # hours arrive in order, one file per hour -> each emission is the
    # window ending at that hour, directly comparable to the batch row
    hours = [100, 101, 102, 103]
    cents = {
        100: [100 * k for k in range(0, 50)],
        101: [100 * k for k in range(20, 90)],
        102: [0, 1, 2, 300, 40000, 500000],
        103: [100 * k for k in range(5, 10)] + [7, 3],
    }
    for i, h in enumerate(hours):
        _write_file(spark, _rows(h, cents[h]), stage, f"b{i}.parquet")
    rows = sorted(
        _run(spark, stage, str(tmp_path / "wal"), str(tmp_path / "out")),
        key=lambda r: r.window_end_eh,
    )
    assert [r.window_end_eh for r in rows] == hours

    # batch twin over the SAME data shaped as an events table.  The
    # twin computes cents as floor(value*100), and a fractional-cent
    # double can land one cent off after the round-trip — so the batch
    # comparison uses hours 100/101, whose cents are whole dollars
    # (value*100 is float-exact); hours 102/103 still exercise the
    # streaming side above
    os.makedirs(sf, exist_ok=True)
    all_rows = ", ".join(
        f"(timestamp_micros({h} * 3600000000), CAST({c} AS DOUBLE))"
        for h in (100, 101)
        for c in cents[h]
    )
    spark.sql(
        "SELECT monotonically_increasing_id() AS event_id, ts, "
        "CAST(1 AS BIGINT) AS user_id, 'd' AS event_type, value / 100.0 "
        "AS value, map('k', 'v') AS props "
        f"FROM VALUES {all_rows} AS t(ts, value)"
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    batch = {
        r.epoch_hour: r
        for r in QUERIES["evt_sliding_loghist_quantiles"](spark, sf).collect()
    }
    for r in rows:
        if r.window_end_eh not in (100, 101):
            continue
        b = batch[r.window_end_eh]
        assert (
            r.n_hours_merged,
            r.n_events_window,
            r.p50_hist,
            r.p95_hist,
        ) == (
            b.n_hours_merged,
            b.n_events,
            b.p50_hist,
            b.p95_hist,
        ), (r, b)


def test_eviction_and_wal_restart(spark, tmp_path):
    stage = str(tmp_path / "stage")
    wal = str(tmp_path / "wal")
    out = str(tmp_path / "out")
    _write_file(spark, _rows(100, [100, 200, 300, 400]), stage, "b1.parquet")
    _write_file(spark, _rows(103, [1000, 2000]), stage, "b2.parquet")
    rows = sorted(
        _run(spark, stage, wal, out), key=lambda r: r.window_end_eh
    )
    assert [r.window_end_eh for r in rows] == [100, 103]
    assert [r.n_hours_merged for r in rows] == [1, 2]
    assert rows[1].n_events_window == 6  # both hours inside the window

    # restart from the WAL with a far-future hour: 100/103 evicted
    _write_file(spark, _rows(200, [5, 6, 7]), stage, "b3.parquet")
    rows = sorted(
        _run(spark, stage, wal, out), key=lambda r: r.window_end_eh
    )
    (r200,) = [r for r in rows if r.window_end_eh == 200]
    assert r200.n_state_hours == 1
    assert r200.n_events_window == 3
    assert r200.p50_hist == 6  # identity buckets below 8
    assert r200.p95_hist == 7
    assert all(r.n_state_hours <= _SLIDING_LOGQ_W for r in rows)

    # restart with NO new files: nothing re-emitted, nothing recounted
    rows_again = _run(spark, stage, wal, out)
    assert rows_again == []
