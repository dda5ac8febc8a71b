"""Streaming inverted-index maintenance: after N micro-batches of
document ingest, a BM25 query served from the index alone must equal the
from-scratch batch BM25 over every ingested document — including under
WAL replay (batch_id-overwrite idempotency)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_index,
)
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_retrieval_index_maintenance,
)

QUERY = ["slow", "hash", "batch"]


def _stage_doc_files(spark, docs, stage_dir, n_files):
    os.makedirs(stage_dir, exist_ok=True)
    for i in range(n_files):
        part = docs.where(F.col("doc_id") % n_files == i)
        tmp = tempfile.mkdtemp()
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage_dir, f"b{i:03d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)


def test_index_query_matches_batch_bm25(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stage = str(tmp_path / "stage")
    _stage_doc_files(spark, docs, stage, n_files=3)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = streaming_retrieval_index_maintenance(
        stream, str(tmp_path / "index"), str(tmp_path / "wal")
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = {
        (r.doc_id, r.score, r.rnk)
        for r in bm25_topk_from_index(
            spark, str(tmp_path / "index"), QUERY, k=10
        ).collect()
    }
    want = {
        (r.doc_id, r.score, r.rnk)
        for r in bm25_topk(docs, QUERY, k=10).collect()
    }
    assert got == want
    assert len(want) > 0


def test_replayed_batch_does_not_double_count(spark, sf_dir, tmp_path):
    """Simulate WAL replay by re-running the stream with the SAME index
    dir but a fresh checkpoint: every batch re-executes, overwriting its
    batch_id partitions — term frequencies must not double."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stage = str(tmp_path / "stage")
    _stage_doc_files(spark, docs, stage, n_files=2)
    stream_schema = "doc_id long, text string"
    for wal in ("wal1", "wal2"):  # second run replays everything
        stream = (
            spark.readStream.schema(stream_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = streaming_retrieval_index_maintenance(
            stream, str(tmp_path / "index"), str(tmp_path / wal)
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    got = {
        (r.doc_id, r.score)
        for r in bm25_topk_from_index(
            spark, str(tmp_path / "index"), QUERY, k=10
        ).collect()
    }
    want = {
        (r.doc_id, r.score) for r in bm25_topk(docs, QUERY, k=10).collect()
    }
    assert got == want


def test_empty_query_returns_empty_frame(spark, tmp_path):
    """A no-term query must return an empty (doc_id, score, rnk) frame,
    not an AnalysisException from interpolating an empty VALUES list."""
    got = bm25_topk_from_index(spark, str(tmp_path / "no-index"), [], k=5)
    assert got.columns == ["doc_id", "score", "rnk"]
    assert got.count() == 0


def test_reingested_doc_last_write_wins(spark, tmp_path):
    """A doc_id re-ingested (updated) in a later batch must count ONCE:
    query-time last-write-wins resolves each doc to its max batch_id, so
    N and the doclen sum reflect the final corpus, and scores equal a
    from-scratch BM25 over it."""
    v1 = spark.sql(
        "SELECT * FROM VALUES "
        "(1, 'slow hash join'), (2, 'fast scan'), (3, 'hash hash batch') "
        "AS t(doc_id, text)"
    )
    update = spark.sql(
        "SELECT * FROM VALUES (1, 'batch batch batch slow') AS t(doc_id, text)"
    )
    stage = str(tmp_path / "stage")
    _stage_v1 = v1.coalesce(1)
    os.makedirs(stage, exist_ok=True)
    for name, df in (("b000.parquet", _stage_v1), ("b001.parquet", update.coalesce(1))):
        tmp = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(src, os.path.join(stage, name))
        shutil.rmtree(tmp, ignore_errors=True)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = streaming_retrieval_index_maintenance(
        stream, str(tmp_path / "index"), str(tmp_path / "wal")
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    final_corpus = update.unionByName(
        v1.where(F.col("doc_id") != 1)
    )
    got = {
        (r.doc_id, r.score, r.rnk)
        for r in bm25_topk_from_index(
            spark, str(tmp_path / "index"), QUERY, k=10
        ).collect()
    }
    want = {
        (r.doc_id, r.score, r.rnk)
        for r in bm25_topk(final_corpus, QUERY, k=10).collect()
    }
    assert got == want
    assert len(want) > 0
