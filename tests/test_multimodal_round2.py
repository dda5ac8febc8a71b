"""Resize + frame-sample plumbing: schema, batch shape, and determinism
of the Arrow-batched media stages (decode itself is stubbed — no image
libs in this container; the Spark-side contract is what's under test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.multimodal import (
    media_from_documents,
    resize_media,
    sample_frames,
)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    return media_from_documents(docs)


def test_resize_contract(spark, sf_dir):
    out = resize_media(_media(spark, sf_dir), w=64, h=48).collect()
    assert len(out) == 100
    want = max(1, 64 * 48 // 64)
    for r in out:
        assert r.n_bytes == want == len(r.payload)
        assert (r.target_w, r.target_h) == (64, 48)


def test_resize_deterministic(spark, sf_dir):
    m = _media(spark, sf_dir)
    a = {r.doc_id: bytes(r.payload) for r in resize_media(m).collect()}
    b = {r.doc_id: bytes(r.payload) for r in resize_media(m).collect()}
    assert a == b


def test_frame_sampling_fanout_and_offsets(spark, sf_dir):
    m = _media(spark, sf_dir)
    out = sample_frames(m, n_frames=4, frame_bytes=16)
    rows = out.collect()
    assert len(rows) == 400  # 100 media rows × 4 frames
    per_doc = out.groupBy("doc_id").agg(
        F.countDistinct("frame_idx").alias("n")
    ).collect()
    assert all(r.n == 4 for r in per_doc)
    # frame 0 must be the payload prefix
    src = {r.doc_id: bytes(r.payload) for r in m.collect()}
    for r in rows:
        if r.frame_idx == 0:
            assert src[r.doc_id].startswith(bytes(r.frame_bytes))
