"""Integer-exact PageRank: hand-computed recurrence on a 3-node graph."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.graph import pagerank


def test_one_iteration_exact_values(spark):
    # 0→1, 1→0, 2→0 ; N=3 ; SCALE div 3 = 333333333333
    # base term = (15·333333333333) div 100 = 49999999999
    # r1(0) = base + (85·(r0(1)+r0(2))) div 100 = 49999999999 + 566666666666
    # r1(1) = base + (85·r0(0)) div 100      = 49999999999 + 283333333333
    # r1(2) = base + 0
    edges = spark.sql(
        "SELECT * FROM VALUES (0L, 1L), (1L, 0L), (2L, 0L) AS t(src, dst)"
    )
    got = {r.id: r.rank_q for r in pagerank(edges, n_iter=1).collect()}
    assert got == {
        0: 49999999999 + 566666666666,
        1: 49999999999 + 283333333333,
        2: 49999999999,
    }


def test_rank_order_stable_after_three_iters(spark):
    edges = spark.sql(
        "SELECT * FROM VALUES (0L, 1L), (1L, 0L), (2L, 0L) AS t(src, dst)"
    )
    got = {r.id: r.rank_q for r in pagerank(edges, n_iter=3).collect()}
    assert got[0] > got[1] > got[2] > 0
