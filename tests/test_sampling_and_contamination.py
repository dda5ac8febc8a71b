"""Semantics of the training-data curation operators added in round 2:
deterministic stratified sampling, token-budget sequence packing,
benchmark contamination, and SimHash hamming pairs (pigeonhole recall).
Planted-fixture checks — oracle parity covers the registry queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    benchmark_contamination,
    simhash_hamming_pairs,
)
from aws_kinesis_data_streams_replicator_spark.operators.sampling import (
    hash_rate_threshold,
    pack_sequences,
    stratified_sample,
)


def _docs(spark, rows):
    values = ", ".join(
        "({}, '{}', '{}')".format(i, text.replace("'", ""), lang)
        for i, text, lang in rows
    )
    return spark.sql(f"SELECT * FROM VALUES {values} AS t(doc_id, text, lang)")


# --------------------------------------------------------------------- sample


def test_hash_rate_threshold_endpoints():
    assert hash_rate_threshold(0.0) == "0000"
    assert hash_rate_threshold(1.0) == "ffff"
    assert hash_rate_threshold(0.5) == "8000"
    with pytest.raises(ValueError):
        hash_rate_threshold(1.5)


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_en = docs.where(F.col("lang") == "en").count()
    sampled = stratified_sample(docs, {"en": 0.25, "zh": 0.5})
    # rate 0 ⇒ stratum vanishes; rate 1 default keeps ≈ everything
    zero = stratified_sample(docs, {"en": 0.0})
    assert zero.where(F.col("lang") == "en").count() == 0
    assert zero.where(F.col("lang") != "en").count() >= (
        docs.where(F.col("lang") != "en").count() - 1
    )
    # en downsampled to ≈25% (binomial 5σ slack on the tiny fixture)
    got = sampled.where(F.col("lang") == "en").count()
    assert abs(got - 0.25 * n_en) <= 5 * (0.25 * 0.75 * n_en) ** 0.5 + 1
    # identical plan → identical rows (no RNG state)
    a = {r.doc_id for r in sampled.select("doc_id").collect()}
    b = {r.doc_id for r in stratified_sample(docs, {"en": 0.25, "zh": 0.5}).select("doc_id").collect()}
    assert a == b


def test_stratified_sample_duplicate_texts_travel_together(spark):
    docs = _docs(
        spark,
        [(i, f"unique text number {i}", "en") for i in range(40)]
        + [(100, "the exact same text", "en"), (101, "the exact same text", "en")],
    )
    kept = {
        r.doc_id
        for r in stratified_sample(docs, {"en": 0.5}).select("doc_id").collect()
    }
    assert (100 in kept) == (101 in kept)


# ----------------------------------------------------------------------- pack


def test_pack_sequences_bin_rule(spark):
    # tokens: 4,4,4,9,2 with budget 10 → cum_before 0,4,8,12,21
    # → bins 0,0,0,1,2 (a doc crossing the budget stays in its bin;
    #   the NEXT doc opens the new one)
    rows = [
        (1, "a b c d", "en"),
        (2, "a b c d", "en"),
        (3, "a b c d", "en"),
        (4, "a b c d e f g h i", "en"),
        (5, "a b", "en"),
    ]
    out = {
        (r.bin_id, r.n_docs, r.bin_tokens, r.first_doc, r.last_doc)
        for r in pack_sequences(_docs(spark, rows), token_budget=10).collect()
    }
    assert out == {(0, 3, 12, 1, 3), (1, 1, 9, 4, 4), (2, 1, 2, 5, 5)}


def test_pack_sequences_strata_independent(spark):
    rows = [(1, "a b c", "en"), (2, "a b c", "de"), (3, "a b c", "en")]
    out = pack_sequences(_docs(spark, rows), token_budget=4)
    per_lang = {(r.lang, r.bin_id): r.n_docs for r in out.collect()}
    # en: cum_before 0,3 → bins 0,0 ; de: bin 0 alone
    assert per_lang == {("en", 0): 2, ("de", 0): 1}


# -------------------------------------------------------------- contamination


def test_benchmark_contamination_flags_overlap_only(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon", "en")])
    train = _docs(
        spark,
        [
            (1, "prefix words alpha beta gamma delta then more", "en"),  # hit
            (2, "completely different content with no overlap at all", "en"),
            (3, "alpha beta but the shingle is broken here", "en"),  # 4-gram miss
        ],
    )
    out = {r.doc_id: r for r in benchmark_contamination(train, bench, 4).collect()}
    assert set(out) == {1}
    assert out[1].n_matched == 1  # 'alpha beta gamma delta'
    assert out[1].n_sh == 5  # 8 tokens → 5 4-grams
    assert out[1].contamination_milli == 200


# -------------------------------------------------------------------- simhash


def test_simhash_hamming_pairs_pigeonhole(spark):
    text = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(
        spark,
        [
            (1, text, "en"),
            (2, text, "en"),  # identical → hamming 0
            (3, "entirely unrelated words " * 3 + "zebra xylophone quartz", "en"),
        ],
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_hamming_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0
    with pytest.raises(ValueError):
        simhash_hamming_pairs(docs, n_bands=4, max_hamming=4)
