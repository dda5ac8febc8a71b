"""Record linkage operator (operators/linkage.py): blocking, the
block-size skew cap, integer scoring, and threshold classification."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import linkage


def _recs(spark, rows):
    return spark.createDataFrame(rows, "entity long, block long, f string")


def test_blocking_only_pairs_within_block(spark):
    a = _recs(spark, [(1, 10, "x"), (2, 20, "y")])
    b = _recs(spark, [(3, 10, "x"), (4, 30, "z")])
    got = linkage.blocked_candidate_pairs(a, b, "block").collect()
    assert len(got) == 1
    assert got[0]["entity_a"] == 1 and got[0]["entity_b"] == 3


def test_block_cap_drops_hot_block_entirely(spark):
    # block 10 has 3 A-side records: with cap 2 the WHOLE block is
    # dropped (both sides must survive), so the hot key generates zero
    # pairs instead of 3x1 — the 100-TB explosion guard.
    a = _recs(spark, [(1, 10, "x"), (2, 10, "y"), (3, 10, "z"), (4, 20, "w")])
    b = _recs(spark, [(5, 10, "x"), (6, 20, "w")])
    got = linkage.blocked_candidate_pairs(
        a, b, "block", max_block_size=2
    ).collect()
    assert [(r["entity_a"], r["entity_b"]) for r in got] == [(4, 6)]


def test_scoring_sums_weights_and_emits_agreements(spark):
    a = _recs(spark, [(1, 10, "x")])
    b = _recs(spark, [(2, 10, "x"), (3, 10, "y")])
    pairs = linkage.blocked_candidate_pairs(a, b, "block")
    scored = linkage.score_pairs(
        pairs,
        [
            ("f", F.col("f_a") == F.col("f_b"), 40),
            ("ent", F.col("entity_a") == F.col("entity_b"), 7),
        ],
    )
    by_b = {r["entity_b"]: r for r in scored.collect()}
    assert by_b[2]["score"] == 40 and by_b[2]["agree_f"] is True
    assert by_b[3]["score"] == 0 and by_b[3]["agree_f"] is False


def test_classify_thresholds(spark):
    df = spark.createDataFrame(
        [(80,), (50,), (10,)], "score long"
    )
    got = {
        r["score"]: r["decision"]
        for r in linkage.classify(df, 75, 35).collect()
    }
    assert got == {80: "match", 50: "possible", 10: "non_match"}
