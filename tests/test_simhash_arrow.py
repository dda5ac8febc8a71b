"""Pin udfs.simhash_bits_pandas (the r12 Arrow twin) bit-identical to
the JVM expression form functions/hashing.py:simhash_bits, per-family
and through the composed 64-bit fingerprint — including the edge shapes
the majority vote must get right: even-count ties (count*2 > n), single
tokens, empty-string tokens, and the sf0.001 documents fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.functions.hashing import (
    simhash_bits,
    word_tokens,
)
from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    simhash64_fingerprints,
    simhash_fingerprints,
)
from aws_kinesis_data_streams_replicator_spark.operators.udfs import (
    simhash_bits_pandas,
)

EDGE_TEXTS = [
    "",  # split("") -> [""] : one md5("") hash
    "a",
    "a a",  # duplicate tokens, even count (tie surface)
    "a b",
    "a b c d",
    "x " * 63 + "x",  # 64 identical tokens
    "the quick brown fox jumps over the lazy dog",
    " ".join(str(i) for i in range(101)),  # odd count, all distinct
]


def _both(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select(
        "doc_id",
        F.transform(word_tokens(F.col("text")), lambda t: F.md5(t)).alias("hs"),
    )
    rows = (
        df.select(
            "doc_id",
            simhash_bits(F.col("hs")).alias("jvm"),
            simhash_bits_pandas(F.col("hs")).alias("arrow"),
        )
        .orderBy("doc_id")
        .collect()
    )
    return rows


def test_edge_texts_bit_identical(spark):
    for r in _both(spark, EDGE_TEXTS):
        assert r.jvm == r.arrow, f"doc {r.doc_id}: {r.jvm} != {r.arrow}"
        assert len(r.arrow) == 32 and set(r.arrow) <= {"0", "1"}


def test_fixture_corpus_bit_identical(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = docs.select(
        "doc_id",
        F.transform(word_tokens(F.col("text")), lambda t: F.md5(t)).alias("hs"),
    )
    n_diff = (
        hashed.select(
            simhash_bits(F.col("hs")).alias("jvm"),
            simhash_bits_pandas(F.col("hs")).alias("arrow"),
        )
        .where(F.col("jvm") != F.col("arrow"))
        .count()
    )
    assert n_diff == 0


def test_simhash64_concat_matches_per_family(spark):
    """The 64-bit fingerprint is exactly family-0 ++ family-1 of the
    same majority rule (pins the two-UDF-one-projection composition)."""
    texts = EDGE_TEXTS
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fp = {r.doc_id: r.simhash for r in simhash64_fingerprints(df).collect()}
    fp32 = {r.doc_id: r.simhash for r in simhash_fingerprints(df).collect()}
    from aws_kinesis_data_streams_replicator_spark.functions.hashing import (
        md5_seeded,
    )

    ref1 = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id",
            simhash_bits(
                F.transform(word_tokens(F.col("text")), lambda t: md5_seeded(t, 1))
            ).alias("b"),
        ).collect()
    }
    for i in range(len(texts)):
        assert len(fp[i]) == 64
        assert fp[i][:32] == fp32[i]
        assert fp[i][32:] == ref1[i]
