"""Streaming HLL distinct-count in bounded keyed state
(streaming/stateful.py:streaming_distinct_estimate): the estimate must
track exact distinct counts within HLL tolerance across micro-batches,
registers must be replay-idempotent (max-merge), and a WAL restart must
resume the registers, not reset them."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    _HLL_M,
    _hll_estimate,
    streaming_distinct_estimate,
)

SCHEMA = "event_type string, user_id long"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} AS t(event_type, user_id)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(kind, ids):
    return ", ".join(f"('{kind}', {i})" for i in ids)


def _run(spark, stage, wal, query_name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_distinct_estimate(stream)
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


def test_estimate_tracks_exact_distinct(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # batch 1: users 0..999 (1000 distinct); batch 2 overlaps half and
    # adds 500 new: 500..1499 → union 1500 distinct
    _write_file(spark, _rows("d", range(0, 1000)), stage, "b1.parquet")
    _write_file(spark, _rows("d", range(500, 1500)), stage, "b2.parquet")
    rows = sorted(
        _run(spark, stage, str(tmp_path / "wal"), "hll_out"),
        key=lambda r: r.n_seen,
    )
    assert [r.n_seen for r in rows] == [1000, 2000]
    # 256 registers → ~6.5% standard error; assert a generous 3-sigma
    for r, exact in zip(rows, (1000, 1500)):
        assert abs(r.est_distinct - exact) <= exact * 0.20, (
            r.est_distinct,
            exact,
        )
        assert r.n_registers == _HLL_M


def test_registers_are_replay_idempotent():
    """Register updates are max operations: feeding the same ids twice
    must produce identical registers (the at-least-once safety the
    docstring claims) — asserted on the pure estimator path."""
    import hashlib

    def regs_of(ids, base=None):
        regs = list(base) if base else [0] * _HLL_M
        for uid in ids:
            h = int.from_bytes(
                hashlib.md5(str(uid).encode()).digest()[:8], "big"
            )
            idx = h & (_HLL_M - 1)
            rank = 56 - (h >> 8).bit_length() + 1
            if rank > regs[idx]:
                regs[idx] = rank
        return regs

    once = regs_of(range(500))
    twice = regs_of(range(500), base=once)
    assert once == twice
    assert _hll_estimate(once) == _hll_estimate(twice)


def test_wal_restore_resumes_registers(spark, tmp_path):
    # memory sink can't recover from a WAL; use the foreachBatch →
    # parquet pattern of test_streaming_quantile_sketch for the restart
    stage = str(tmp_path / "stage")
    wal = str(tmp_path / "wal")
    out = str(tmp_path / "out")
    _write_file(spark, _rows("w", range(0, 800)), stage, "b1.parquet")

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            streaming_distinct_estimate(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", wal)
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_once()
    # second run, SAME WAL: a batch of 400 overlapping + 200 new users;
    # the restored registers must carry the first 800, so the estimate
    # reflects ~1000 distinct, not ~600
    _write_file(spark, _rows("w", range(400, 1000)), stage, "b2.parquet")
    run_once()
    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.n_seen
    )
    assert rows[-1].n_seen == 1400
    assert abs(rows[-1].est_distinct - 1000) <= 1000 * 0.20, rows[
        -1
    ].est_distinct
