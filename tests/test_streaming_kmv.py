"""Streaming KMV distinct (streaming/stateful.py:streaming_kmv_distinct):
the final emission per key must equal the batch bottom-k sketch over
everything ever seen — min-k of per-batch min-k IS the global min-k —
and the estimate must use the exact integer arithmetic of the batch
agg_kmv_set_operations legs."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    _KMV_DOM,
    _KMV_K,
    kmv_hash,
    streaming_kmv_distinct,
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


def _rows(ids):
    return ", ".join(f"('d', {i})" for i in ids)


def _expected(ids):
    uniq = sorted({int(i) for i in ids})
    keep = sorted(((kmv_hash(u), u) for u in uniq))[:_KMV_K]
    kth = keep[-1][0]
    n_sketch = len(keep)
    est = (
        n_sketch
        if n_sketch < _KMV_K
        else (_KMV_K - 1) * _KMV_DOM // max(kth, 1)
    )
    return n_sketch, est, kth


def test_final_emission_equals_batch_sketch(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # three overlapping batches; 500 distinct users total (> k)
    batches = [range(0, 200), range(100, 350), range(300, 500)]
    for i, ids in enumerate(batches):
        _write_file(spark, _rows(ids), stage, f"b{i}.parquet")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_kmv_distinct(stream)
        .writeStream.format("memory")
        .queryName("kmv_out")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    rows = spark.sql("SELECT * FROM kmv_out").collect()
    final = max(rows, key=lambda r: r.n_seen)
    all_ids = [i for b in batches for i in b]
    n_sketch, est, kth = _expected(all_ids)
    assert final.n_seen == sum(len(b) for b in batches)
    assert (final.n_sketch, final.est_distinct, final.kth_hash) == (
        n_sketch,
        est,
        kth,
    )
    # the estimate estimates: 500 exact, sigma ~ 12.6% at k=64
    assert abs(final.est_distinct - 500) <= 500 * 0.5


def test_refold_is_idempotent():
    ids = list(range(1000))
    once = _expected(ids)
    again = _expected(ids + ids)  # at-least-once redelivery
    assert once == again
