"""Streaming chunker + chunk-hash dedup gate
(streaming/job.py:streaming_chunk_gate): indexed chunks are dropped,
novel chunks of known or new documents pass, and the emitted hashes
equal the batch chunker's (doc_chunk_windows machinery — one shared
builder, so a drift would also hash-fail the oracle query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.text import (
    CHUNK_W,
    chunk_rows,
)
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_chunk_gate,
)


def _docs(spark, rows):
    return spark.sql(
        "SELECT CAST(i AS BIGINT) AS doc_id, t AS text FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(i, t)"
    )


def _long_text(seed: str, n_tokens: int) -> str:
    return " ".join(f"{seed}{j}" for j in range(n_tokens))


def test_gate_drops_indexed_chunks_keeps_new(spark):
    corpus = _docs(spark, [(0, _long_text("a", 80))])
    index = chunk_rows(corpus).select(
        F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash")
    )
    # stream: doc 1 is a byte-identical recrawl of doc 0 (every chunk
    # indexed); doc 2 is novel
    batch = _docs(
        spark, [(1, _long_text("a", 80)), (2, _long_text("b", 80))]
    )
    kept = streaming_chunk_gate(batch, index).collect()
    assert {r.doc_id for r in kept} == {2}
    # the novel doc keeps ALL its chunks, hashes matching the batch
    # chunker's own
    want = {
        r.chunk_idx: r.chunk_text
        for r in chunk_rows(
            _docs(spark, [(2, _long_text("b", 80))])
        ).collect()
    }
    got = {r.chunk_idx: r.chunk_text for r in kept}
    assert got == want


def test_partial_overlap_passes_only_novel_chunks(spark):
    # corpus doc = 56 tokens (chunks at 0 and 24); stream doc shares
    # the first 56 tokens but continues to 104 — its chunk 0 and 1 are
    # NOT byte-identical beyond... chunk 0 (tokens 0-31) IS identical,
    # chunk 1 (24-55) identical, later chunks novel
    base = _long_text("c", 56)
    corpus = _docs(spark, [(0, base)])
    index = chunk_rows(corpus).select(
        F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash")
    )
    extended = base + " " + _long_text("d", 48)
    batch = _docs(spark, [(5, extended)])
    kept = streaming_chunk_gate(batch, index).collect()
    idxs = sorted(r.chunk_idx for r in kept)
    # extended doc chunks start at 0, 24, 48, 72; [0,32) and [24,56)
    # are byte-identical to the corpus chunks → dropped; the two tail
    # chunks reach into the novel tokens → kept
    assert idxs == [2, 3]
    for r in kept:
        assert r.start_tok + CHUNK_W > 56
