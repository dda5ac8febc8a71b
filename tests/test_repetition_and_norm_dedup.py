"""Gopher repetition signals + normalized exact dedup unit tests."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.text import (
    dedup_normalized,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_dominated_doc(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam eggs"),
            (2, "alpha beta gamma delta"),
        ],
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = got[1]
    assert r1.top_term == "spam" and r1.top_term_cnt == 4
    assert r1.n_terms == 5 and r1.top_term_milli == 800
    # bigrams of doc 1: "spam spam" x3, "spam eggs" x1 -> 4 bigrams
    assert r1.top_bigram == "spam spam" and r1.top_bigram_cnt == 3
    assert r1.n_bigrams == 4 and r1.top_bigram_milli == 750
    # uniform doc: every count 1, lexicographic tiebreak wins
    r2 = got[2]
    assert r2.top_term == "alpha" and r2.top_term_cnt == 1
    assert r2.top_term_milli == 250
    assert r2.top_bigram == "alpha beta" and r2.top_bigram_cnt == 1


def test_dedup_normalized_collapses_variants(spark):
    docs = _docs(
        spark,
        [
            (10, "Hello, World!"),
            (11, "hello   world"),
            (12, "HELLO WORLD."),
            (13, "goodbye world"),
        ],
    )
    rows = sorted(dedup_normalized(docs).collect(), key=lambda r: r.keep_doc_id)
    assert len(rows) == 2
    assert rows[0].keep_doc_id == 10 and rows[0].n_variants == 3
    assert rows[1].keep_doc_id == 13 and rows[1].n_variants == 1
