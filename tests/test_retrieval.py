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


def test_hybrid_rrf_fuses_both_rankings(spark):
    """A doc ranked #1 in both lists must out-score docs present in one;
    rrf_micro = 1e6 DIV (60+rank) summed over the lists containing it."""
    from pyspark.sql import functions as F

    from aws_kinesis_data_streams_replicator_spark.operators.retrieval import (
        hybrid_rrf_topk,
    )

    docs = _docs(
        spark,
        [
            (0, "query anchor"),          # vec query doc (excluded from vec list)
            (1, "data data data"),        # strong lexical + strong vector
            (2, "data data x"),           # lexical only (orthogonal vector)
            (3, "unrelated text"),        # vector only
        ],
    )
    emb = spark.sql(
        """
        SELECT vec_id, embedding FROM VALUES
            (0, array(1.0, 0.0, 0.0)),
            (1, array(0.99, 0.1, 0.0)),
            (2, array(0.0, 0.0, 1.0)),
            (3, array(0.9, 0.2, 0.0))
        AS t(vec_id, embedding)
        """
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    out = {
        r.doc_id: (r.rrf_micro, r.rnk)
        for r in hybrid_rrf_topk(docs, emb, ["data"], 0, k=4, k_each=3).collect()
    }
    # doc 1: rank 1 lexical + rank 1 vector = 2 * (1e6 DIV 61)
    assert out[1][0] == 2 * (1_000_000 // 61)
    assert out[1][1] == 1
    # single-list docs contribute only one term
    assert out[2][0] < out[1][0] and out[3][0] < out[1][0]


def test_quality_classifier_portable_weights(spark):
    """Weight of a token = hex16(md5[:4]) - 32768, summed; label from the
    length-normalized score — spot-check one doc against hashlib."""
    import hashlib

    from aws_kinesis_data_streams_replicator_spark.operators.text import (
        quality_classifier_scores,
    )

    docs = spark.sql(
        "SELECT * FROM VALUES (7, 'alpha beta gamma', 'en') AS t(doc_id, text, lang)"
    )
    row = quality_classifier_scores(docs).collect()[0]
    expect = sum(
        int(hashlib.md5(t.encode()).hexdigest()[:4], 16) - 32768
        for t in ["alpha", "beta", "gamma"]
    )
    assert row.score == expect
    assert row.n_tokens == 3
    # int(expect / 3) truncates toward zero for both signs, matching
    # Spark DIV — no sign conditional needed
    assert row.score_per_token == int(expect / 3)
    assert row.label == ("keep" if row.score_per_token >= 0 else "drop")
