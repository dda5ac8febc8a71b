"""Planted-fixture semantics for the round-2 quality/mixing operators:
Gopher rules, char-bigram familiarity, mixture weights, int8 quantize."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.functions.vectors import (
    quantize_embedding,
    quantize_int8,
)
from aws_kinesis_data_streams_replicator_spark.operators.sampling import (
    mixture_weights,
)
from aws_kinesis_data_streams_replicator_spark.operators.text import (
    char_bigram_scores,
    gopher_quality,
)


def _docs(spark, rows):
    values = ", ".join(
        f"({i}L, '{t}', 'en', 'src0')" for i, t in enumerate(rows)
    )
    return spark.sql(
        f"SELECT * FROM VALUES {values} AS t(doc_id, text, lang, source)"
    )


def test_gopher_each_rule_fails_independently(spark):
    good = "the quick brown fox jumps over a lazy dog " * 6  # 60 words + ''
    short = "the quick a fox"  # n_words < min
    no_stop = "quick brown fox jumps " * 15  # 0 stopwords
    # mean word length (45+34+3+1)/4 = 20.75 > 10 → fails the mwl cap
    long_words = (
        "pneumonoultramicroscopicsilicovolcanoconiosis"
        " supercalifragilisticexpialidocious the a " * 15
    )
    df = _docs(spark, [good.strip(), short, no_stop.strip(), long_words.strip()])
    out = {
        r.doc_id: r.gopher_pass
        for r in gopher_quality(df, min_words=20).collect()
    }
    assert out == {0: 1, 1: 0, 2: 0, 3: 0}


def test_gopher_signals_exact(spark):
    df = _docs(spark, ["the cat a hat"])
    r = gopher_quality(df).collect()[0]
    assert r.n_words == 4
    assert r.sum_wlen == 10  # 3+3+1+3
    assert r.n_alpha_words == 4
    assert r.n_stopwords == 2  # the, a
    assert r.mean_wlen_x100 == 250


def test_char_bigram_familiarity_counts(spark):
    # corpus: 'abab' → bigrams ab,ba,ab ; 'ab' → ab.
    # global counts: ab=3, ba=1.
    df = _docs(spark, ["abab", "ab"])
    out = {r.doc_id: r for r in char_bigram_scores(df).collect()}
    assert out[0].n_bigrams == 3 and out[0].familiarity == 3 + 1 + 3
    assert out[1].n_bigrams == 1 and out[1].familiarity == 3
    assert out[0].familiarity_per_bigram == 2  # 7 DIV 3
    # single-char docs are excluded, not errored
    assert 2 not in {
        r.doc_id for r in char_bigram_scores(_docs(spark, ["ab", "xy", "z"])).collect()
    }


def test_mixture_weights_uniform_target(spark):
    # 3 docs in (en,src0), 1 doc in (fr,src1) → total 4, strata 2.
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (0L, 'x', 'en', 'src0'), (1L, 'y', 'en', 'src0'),
          (2L, 'z', 'en', 'src0'), (3L, 'w', 'fr', 'src1')
        AS t(doc_id, text, lang, source)
        """
    )
    out = {
        (r.lang, r.source): (r.n_docs, r.weight_ppm)
        for r in mixture_weights(df).collect()
    }
    # dominant stratum downweighted: 4e6/(2*3)=666666; rare upweighted: 4e6/2=2e6
    assert out[("en", "src0")] == (3, 666_666)
    assert out[("fr", "src1")] == (1, 2_000_000)


def test_quantize_int8_codes_and_zero_vector(spark):
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (0L, array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT), CAST(0.125 AS FLOAT))),
          (1L, array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)))
        AS t(vec_id, embedding)
        """
    )
    q = df.select(
        "vec_id", quantize_embedding(F.col("embedding")).alias("qv")
    ).select(
        "vec_id",
        F.greatest(
            F.array_max(F.transform("qv", F.abs)), F.lit(1).cast("long")
        ).alias("maxabs"),
        "qv",
    )
    out = {
        r.vec_id: r.q8
        for r in q.select(
            "vec_id", quantize_int8(F.col("qv"), F.col("maxabs")).alias("q8")
        ).collect()
    }
    # scale = 0.5 → codes: 127, -63 (floor of 63.5), 31 (floor of 31.75)
    assert out[0] == [127, -63, 31]
    assert out[1] == [0, 0, 0]  # maxabs floored at 1, no div-by-zero
