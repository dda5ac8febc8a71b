"""Round-5-staged operators: shingle containment, stopword discovery,
BPE merge step, activity streaks — hand-computed small cases (fixture-
scale equivalence is covered by the oracle parity suite)."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    shingle_containment_pairs,
)
from aws_kinesis_data_streams_replicator_spark.operators.text import (
    bpe_merge_step,
    stopword_candidates,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_embedded_doc(spark):
    # doc 1 is fully contained in doc 2 (Jaccard would be only 3/8);
    # doc 3 shares nothing.
    rows = [
        (1, "a b c d e"),  # 3 shingles: abc bcd cde
        (2, "a b c d e x y z w v"),  # 8 shingles, the first 3 = doc 1's
        (3, "p q r s t"),
    ]
    got = {
        (r.doc_a, r.doc_b): r
        for r in shingle_containment_pairs(
            _docs(spark, rows), threshold_bp=8000
        ).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r.n_inter, r.n_a, r.n_b) == (3, 3, 8)
    assert r.cont_a_bp == 10000  # 3/3 — full containment
    assert r.cont_b_bp == 3750  # 3/8
    # Jaccard 3/8 = 0.375 would NOT pass a 0.8 similarity gate


def test_containment_threshold_filters(spark):
    rows = [(1, "a b c d e"), (2, "c d e f g h i j k l")]
    # inter = 1 shingle ("c d e"); min side has 3 → 3333 bp < 8000
    assert (
        shingle_containment_pairs(_docs(spark, rows), threshold_bp=8000).count()
        == 0
    )


def test_stopword_candidates_df_ratio(spark):
    rows = [
        (1, "the cat"),
        (2, "the dog"),
        (3, "the cow"),
        (4, "a bird"),
    ]
    got = {r.word: r for r in stopword_candidates(
        _docs(spark, rows).selectExpr("doc_id", "text"), min_df_ratio_bp=7000
    ).collect()}
    assert set(got) == {"the"}
    assert got["the"].df == 3
    assert got["the"].df_ratio_bp == 7500
    assert got["the"].df_rank == 1


def test_bpe_merge_step_applies_top_merge(spark):
    # vocabulary: "abab" ×3, "abc" ×2 → pair counts: (a,b)=3*2+2=8,
    # (b,a)=3, (b,c)=2.  Winner = "ab".  After replace with sentinel:
    # "abab"→ S S (pair (ab,ab)=3), "abc"→ S c (pair (ab,c)=2).
    rows = [(1, "abab abab abc"), (2, "abab abc")]
    out = bpe_merge_step(_docs(spark, rows), top_k=10).collect()
    assert all(r.merged_pair == "ab" for r in out)
    got = {(r.sym_a, r.sym_b): r.n_pairs for r in out}
    assert got == {("ab", "ab"): 3, ("ab", "c"): 2}
    ranks = {(r.sym_a, r.sym_b): r.pair_rank for r in out}
    assert ranks[("ab", "ab")] == 1


def test_bpe_merge_replace_is_left_to_right(spark):
    # "aaa" ×1: pairs (a,a)=2 → winner "aa"; replace("aaa","aa",S)="Sa"
    # (greedy non-overlapping, NOT "aS") → post-merge pair (aa, a)=1.
    rows = [(1, "aaa")]
    out = bpe_merge_step(_docs(spark, rows), top_k=5).collect()
    assert len(out) == 1
    assert (out[0].sym_a, out[0].sym_b, out[0].n_pairs) == ("aa", "a", 1)


def test_weighted_median_hand_case(spark):
    # values 10(w1), 20(w1), 30(w8): total w=10, half=5 → first value
    # with 2*cw >= tw is 30 (cw: 1, 2, 10).
    from pyspark.sql import functions as F, Window

    df = spark.sql(
        "SELECT * FROM VALUES ('A', 10, 1), ('A', 20, 1), ('A', 30, 8) "
        "AS t(g, cents, w)"
    )
    g = df.groupBy("g", "cents").agg(F.sum("w").alias("w"))
    r = g.select(
        "g",
        "cents",
        "w",
        F.sum("w")
        .over(
            Window.partitionBy("g")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cw"),
        F.sum("w").over(Window.partitionBy("g")).alias("tw"),
    )
    row = (
        r.groupBy("g")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents"))).alias(
                "wm"
            )
        )
        .collect()[0]
    )
    assert row.wm == 30


def test_multitouch_credit_sums_to_1000_per_purchase(spark, sf_dir):
    from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES
    from pyspark.sql import functions as F

    out = QUERIES["evt_multitouch_attribution"](spark, sf_dir)
    total_credit = out.agg(F.sum("credit_milli")).collect()[0][0]
    # total credit must be exactly 1000 x (purchases with >=1 touch)
    from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("u"),
        F.col("us").alias("p_us"),
    )
    t = ev.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("u"), F.col("us").alias("t_us")
    )
    n_with_touch = (
        p.join(t, "u")
        .where(
            (F.col("t_us") < F.col("p_us"))
            & (F.col("p_us") - F.col("t_us") <= 7 * 86400 * 1_000_000)
        )
        .select("p_id")
        .distinct()
        .count()
    )
    assert total_credit == 1000 * n_with_touch


def test_phrase_search_counts_repeated_occurrences(spark):
    from aws_kinesis_data_streams_replicator_spark.functions.hashing import (
        word_tokens,
    )
    from pyspark.sql import functions as F

    # doc 1 contains the phrase twice, doc 2 once reversed (no match)
    docs = spark.sql(
        "SELECT * FROM VALUES "
        "(1, 'slow hash batch x slow hash batch'), "
        "(2, 'batch hash slow') AS t(doc_id, text)"
    )
    pos = docs.select(
        "doc_id", F.posexplode(word_tokens(F.col("text"))).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    p = pos.where(F.col("word").isin("slow", "hash", "batch"))
    p1 = p.where(F.col("word") == "slow").select("doc_id", "pos")
    p2 = p.where(F.col("word") == "hash").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    p3 = p.where(F.col("word") == "batch").select(
        "doc_id", (F.col("pos") - 2).alias("pos")
    )
    got = {
        r.doc_id: r.n
        for r in p1.join(p2, ["doc_id", "pos"])
        .join(p3, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {1: 2}


def test_salted_join_equals_plain_join(spark, sf_dir):
    from aws_kinesis_data_streams_replicator_spark.operators.util import (
        salted_join,
    )
    from aws_kinesis_data_streams_replicator_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    got = (
        salted_join(orders, customer, "o_custkey", n_salt=8,
                    salt_source="o_orderkey")
        .groupBy("c_nationkey")
        .count()
    )
    want = orders.join(customer, "o_custkey").groupBy("c_nationkey").count()
    assert {(r.c_nationkey, r["count"]) for r in got.collect()} == {
        (r.c_nationkey, r["count"]) for r in want.collect()
    }


def test_winnowing_hand_case(spark):
    """Hand-computed MOSS winnowing: 8 tokens → 6 3-gram hashes, window
    w=4 → 3 full windows; each selects its min (hash, pos).  The
    fingerprint count must equal the number of DISTINCT selected
    positions, which is ≤ 3 and ≥ ceil(6/4) by the winnowing density
    guarantee."""
    from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES
    import hashlib

    rows = [(1, "a b c d e f g h")]
    docs = spark.sql(
        "SELECT * FROM VALUES (1, 'a b c d e f g h') AS t(doc_id, text)"
    )
    # reproduce selection in python
    toks = "a b c d e f g h".split(" ")
    hs = [
        hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
        for i in range(len(toks) - 2)
    ]
    sel = set()
    for start in range(len(hs) - 3):
        window = [(hs[start + j], start + j + 1) for j in range(4)]
        sel.add(min(window))
    from aws_kinesis_data_streams_replicator_spark.functions.hashing import (
        shingles_of_tokens,
        word_tokens,
    )
    from pyspark.sql import Window, functions as F

    sh = (
        docs.select("doc_id", word_tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.posexplode(shingles_of_tokens(F.col("toks"), 3)).alias(
                "pos0", "shingle"
            ),
        )
        .select(
            "doc_id", (F.col("pos0") + 1).alias("pos"), F.md5("shingle").alias("h")
        )
    )
    wspec = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    got = {
        (r.fp, r.fp_pos)
        for r in sh.select(
            "pos",
            F.min(F.struct(F.col("h").alias("h"), F.col("pos").alias("pos")))
            .over(wspec)
            .alias("sel"),
        )
        .where(F.col("pos") + 3 <= len(hs))
        .select(F.col("sel.h").alias("fp"), F.col("sel.pos").alias("fp_pos"))
        .distinct()
        .collect()
    }
    assert got == sel


def test_cep_pattern_counts_hand_case(spark):
    """'c v v p c p e c v' → journeys: c v v p (1), c p (2); the final
    'c v' never completes.  Non-overlapping leftmost matching."""
    import re

    seq = "cvvpcpecv"
    assert len(re.findall("c[vse]*p", seq)) == 2


def test_emb_exact_dup_accounting_with_planted_copy(spark):
    from pyspark.sql import functions as F
    from aws_kinesis_data_streams_replicator_spark.functions.vectors import (
        quantize_embedding,
    )

    emb = spark.sql(
        "SELECT * FROM VALUES "
        "(1, array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT))), "
        "(2, array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT))), "  # copy of 1
        "(3, array(CAST(0.1 AS FLOAT), CAST(0.9 AS FLOAT))) "
        "AS t(vec_id, embedding)"
    )
    h = emb.select(
        "vec_id",
        F.md5(
            F.array_join(
                F.transform(
                    quantize_embedding(F.col("embedding")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("vec_hash"),
    )
    row = h.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("vec_hash").alias("d"),
    ).collect()[0]
    assert (row.n, row.d) == (3, 2)  # the planted copy collapses
