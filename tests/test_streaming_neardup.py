"""Streaming incremental dedup against a static corpus LSH index
(streaming/job.py streaming_neardup_filter) + the narrow minhash
signature path it rides on."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    minhash_band_buckets,
    minhash_signatures,
    minhash_signatures_narrow,
)
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_neardup_filter,
)


def _docs(spark, rows):
    values = ", ".join(f"({i}, '{t}')" for i, t in rows)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t(doc_id, text)")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely different corpus document about spark engines"),
]
NEW = [
    # 10 = exact dup of corpus doc 1 (identical signature ⇒ every band
    # hits — deterministic; probabilistic near-dup recall is covered by
    # test_neardup_scale.py); 11 = novel
    (10, "the quick brown fox jumps over the lazy dog tonight"),
    (11, "a genuinely novel document with entirely fresh content here"),
]


def test_narrow_signatures_match_grouped(spark):
    """array_min formulation == explode+groupBy formulation on docs with
    shingles (the streaming-safe path must not change the hash family)."""
    docs = _docs(spark, CORPUS + NEW)
    a = {tuple(r) for r in minhash_signatures(docs, 3, 8).collect()}
    b = {tuple(r) for r in minhash_signatures_narrow(docs, 3, 8).collect()}
    assert a == b


def test_streaming_filter_drops_corpus_matches(spark, tmp_path):
    corpus_index = minhash_band_buckets(_docs(spark, CORPUS), 3, 8, 4)

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    _docs(spark, NEW).write.parquet(os.path.join(stage, "batch0"))
    stream = (
        spark.readStream.schema("doc_id int, text string")
        .option("pathGlobFilter", "*.parquet")
        .parquet(stage + "/*")
    )
    out = streaming_neardup_filter(stream, corpus_index, 3, 8, 4)
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_filtered")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "wal")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {r.doc_id for r in spark.sql("SELECT * FROM neardup_filtered").collect()}
    assert kept == {11}, kept


def test_index_maintenance_catches_cross_batch_dups(spark, tmp_path):
    """Batch 2 contains an exact dup of a batch-1 doc: the maintained
    index must drop it, while batch-1 docs (empty index) all pass."""
    import os
    import time

    from aws_kinesis_data_streams_replicator_spark.streaming.job import (
        streaming_neardup_with_index_maintenance,
    )

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    _docs(spark, CORPUS).write.parquet(os.path.join(stage, "b0"))
    stream = (
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage + "/*")
    )
    q = streaming_neardup_with_index_maintenance(
        stream, out, idx, str(tmp_path / "wal")
    )
    q.processAllAvailable()
    # batch 2: one dup of corpus doc 1 (id 20) + one novel doc (id 21)
    _docs(
        spark,
        [(20, CORPUS[0][1]), (21, "wholly new content never seen before today")],
    ).write.parquet(os.path.join(stage, "b1"))
    deadline = time.time() + 60
    while time.time() < deadline:
        q.processAllAvailable()
        kept_now = spark.read.parquet(out).count()
        if kept_now >= 3:
            break
        time.sleep(1)
    q.stop()
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 21}, kept
