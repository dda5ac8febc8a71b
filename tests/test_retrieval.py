"""Ranked retrieval (TF-IDF / BM25) semantics on planted fixtures."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.retrieval import (
    bm25_topk,
    tfidf_top_terms,
)


def _docs(spark, rows):
    values = ", ".join(f"({i}, '{t}')" for i, t in rows)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t(doc_id, text)")


def test_tfidf_rare_term_wins(spark):
    # 'zebra' appears in 1 of 4 docs; 'the' in all 4 — rare term must
    # outrank the stopword for doc 0 despite equal tf.
    docs = _docs(
        spark,
        [
            (0, "the zebra"),
            (1, "the cat"),
            (2, "the dog"),
            (3, "the cow"),
        ],
    )
    top = {
        (r.doc_id, r.rnk): r.term
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    assert top[(0, 1)] == "zebra" and top[(0, 2)] == "the"


def test_bm25_tf_and_length_effects(spark):
    # doc 0: query term twice, short.  doc 1: once, same length.
    # doc 2: once, padded long.  Expected order: 0, 1, 2.
    docs = _docs(
        spark,
        [
            (0, "data data x"),
            (1, "data y x"),
            (2, "data " + " ".join(["pad"] * 20)),
            (3, "nothing here"),
        ],
    )
    out = bm25_topk(docs, ["data"], k=10).collect()
    order = [r.doc_id for r in sorted(out, key=lambda r: r.rnk)]
    assert order == [0, 1, 2]  # doc 3 has no match — absent entirely
    scores = {r.doc_id: r.score for r in out}
    assert scores[0] > scores[1] > scores[2] > 0


def test_bm25_multi_term_additivity(spark):
    # matching two query terms beats matching one of them.
    docs = _docs(
        spark,
        [
            (0, "data spark x"),
            (1, "data y x"),
        ],
    )
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["data", "spark"], k=5).collect()}
    assert out[0] > out[1]
