"""Skyline (Pareto-dominance) semantics pins.

Two layers:

* hypothesis drives the rollup + exclusive-prefix-max membership rule
  (what part_skyline_pareto_front computes relationally) against a
  brute-force O(n²) dominance reference, including duplicate points
  and price ties;
* a Spark test pins with_global_prefix_max's values against the
  single-partition window form it replaces.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import Window, functions as F

from aws_kinesis_data_streams_replicator_spark.operators.prefix import (
    with_global_prefix_max,
)


def _front_bruteforce(pts):
    out = []
    for i, (p, s) in enumerate(pts):
        dominated = any(
            (q < p and t >= s) or (q <= p and t > s)
            for j, (q, t) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((p, s))
    return sorted(out)


def _front_rollup_rule(pts):
    pmax = {}
    for p, s in pts:
        pmax[p] = max(pmax.get(p, s), s)
    m_lt = {}
    best = None
    for p in sorted(pmax):
        m_lt[p] = best
        best = pmax[p] if best is None else max(best, pmax[p])
    return sorted(
        (p, s)
        for p, s in pts
        if s == pmax[p] and (m_lt[p] is None or s > m_lt[p])
    )


@settings(max_examples=400, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rollup_rule_equals_bruteforce_dominance(pts):
    assert _front_rollup_rule(pts) == _front_bruteforce(pts)


def test_prefix_max_matches_window_form(spark):
    df = spark.sql(
        """
        SELECT k, v FROM VALUES
          (1, 5), (2, 3), (3, 9), (4, 9), (5, 1),
          (6, 12), (7, 2), (8, 12), (9, 0), (10, 7)
        AS t(k, v)
        """
    ).repartition(4)
    got = {
        r.k: r.m
        for r in with_global_prefix_max(
            df, [F.col("k")], "v", "m", num_partitions=3
        ).collect()
    }
    want = {
        r.k: r.m
        for r in df.withColumn(
            "m",
            F.max("v").over(
                Window.orderBy("k").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        ).collect()
    }
    assert got == want
    assert got[1] is None  # globally-first row has no predecessor
