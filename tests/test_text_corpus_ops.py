"""Vocabulary/OOV coverage and PMI collocations on planted fixtures."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.text import (
    pmi_collocations,
    vocab_oov,
)


def _docs(spark, texts):
    values = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    return spark.sql(f"SELECT * FROM VALUES {values} AS t(doc_id, text)")


def test_vocab_oov_counts(spark):
    # 'common' is in 3 docs (df>=3 → in vocab); each rare_i in 1 doc.
    docs = _docs(
        spark,
        ["common rare_a", "common rare_b", "common rare_c common"],
    )
    out = {r.doc_id: r for r in vocab_oov(docs, min_df=3).collect()}
    assert (out[0].n_tokens, out[0].n_oov, out[0].oov_pm) == (2, 1, 500)
    assert (out[2].n_tokens, out[2].n_oov, out[2].oov_pm) == (3, 1, 333)


def test_vocab_oov_all_oov_doc(spark):
    docs = _docs(spark, ["x y", "x z", "q w"])
    out = {r.doc_id: r for r in vocab_oov(docs, min_df=2).collect()}
    # doc 2 shares no vocab term (only 'x' has df>=2)
    assert out[2].n_oov == 2 and out[2].oov_pm == 1000


def test_pmi_prefers_exclusive_pair(spark):
    # 'zig zag' always co-occur and appear nowhere else; 'the end'
    # co-occurs as often but 'the' is everywhere → lower score.
    docs = _docs(
        spark,
        [
            "zig zag the end the a",
            "zig zag the end the b",
            "zig zag the end the c",
            "zig zag the end the d",
            "zig zag the end the e",
        ],
    )
    out = pmi_collocations(docs, min_cooc=5, k=10).collect()
    ranked = [r.bg for r in sorted(out, key=lambda r: r.rnk)]
    assert ranked[0] == "zig zag"
    scores = {r.bg: r.score_q for r in out}
    assert scores["zig zag"] > scores["the end"]
