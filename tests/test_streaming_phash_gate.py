"""Streaming perceptual-image dedup gate (streaming/job.py
streaming_phash_gate): byte-distinct re-encodes of indexed images are
dropped, genuinely new images pass, WAL restart reprocesses nothing."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.multimodal import (
    extract_image_phash,
    media_with_image_variants,
)
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_phash_gate,
)


def _media(spark, ids):
    docs = spark.sql(
        "SELECT CAST(i AS BIGINT) AS doc_id FROM (VALUES "
        + ", ".join(f"({i})" for i in ids)
        + ") t(i)"
    )
    return media_with_image_variants(docs)


def test_gate_drops_indexed_classes_keeps_new(spark):
    # corpus: classes 0..9 (doc_ids 0..9); stream: doc 64 (class 0 —
    # a byte-distinct variant of an indexed class) and doc 20
    # (class 20, unindexed)
    index = extract_image_phash(_media(spark, range(10))).select(
        "width", "height", "phash"
    )
    batch = _media(spark, [64, 20])
    kept = streaming_phash_gate(batch, index).collect()
    assert [r["doc_id"] for r in kept] == [20]
    # the dropped doc 64 was NOT a byte-duplicate of indexed doc 0
    p64 = batch.where(F.col("doc_id") == 64).first()["payload"]
    p0 = _media(spark, [0]).first()["payload"]
    assert bytes(p64) != bytes(p0)


def test_gate_e2e_with_wal_restart(spark, tmp_path):
    index = extract_image_phash(_media(spark, range(10))).select(
        "width", "height", "phash"
    )
    # stage doc_id files; the gate re-derives media per micro-batch
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    for name, ids in [("b1", [64, 20]), ("b2", [128, 30])]:
        df = spark.sql(
            "SELECT CAST(i AS BIGINT) AS doc_id FROM (VALUES "
            + ", ".join(f"({i})" for i in ids)
            + ") t(i)"
        )
        tmp = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(stage, exist_ok=True)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage, f"{name}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def sink(batch_df, batch_id):
        media = media_with_image_variants(batch_df)
        streaming_phash_gate(media, index).select(
            "doc_id", "media_type", "n_bytes"
        ).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "wal"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # 64 and 128 are class-0 variants of indexed images -> dropped;
    # 20 and 30 are unindexed classes -> kept
    assert kept == [20, 30]

    q2 = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "wal"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [20, 30]


def test_gate_picks_up_refreshed_index_across_restarts(spark, tmp_path):
    """The documented deployment pattern: the sink re-reads the index
    PATH per batch, so a corpus-index refresh between runs changes
    gating for subsequent batches only — no stream restart logic
    beyond the WAL."""
    idx_path = str(tmp_path / "idx")
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")

    def write_index(ids):
        extract_image_phash(_media(spark, ids)).select(
            "width", "height", "phash"
        ).write.mode("overwrite").parquet(idx_path)

    def stage_batch(name, ids):
        df = spark.sql(
            "SELECT CAST(i AS BIGINT) AS doc_id FROM (VALUES "
            + ", ".join(f"({i})" for i in ids)
            + ") t(i)"
        )
        import tempfile

        tmp = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(stage, exist_ok=True)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage, f"{name}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    def sink(batch_df, batch_id):
        media = media_with_image_variants(batch_df)
        index = batch_df.sparkSession.read.parquet(idx_path)
        streaming_phash_gate(media, index).select(
            "doc_id"
        ).write.mode("append").parquet(out)

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "wal"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    # index covers class 0 only: doc 64 (class 0) dropped, 1 kept
    write_index([0])
    stage_batch("b1", [64, 1])
    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [1]

    # REFRESH the index to also cover class 1 -> doc 65 (class 1) now
    # dropped while doc 2 (class 2) passes; doc 64's earlier verdict
    # is untouched
    write_index([0, 1])
    stage_batch("b2", [65, 2])
    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [1, 2]
