"""interval_overlap_join contract tests — the r10 ADVICE items:

* cell ids must be EXACT integer floor divisions (F.floor(col / w)
  rounds through a double and mis-cells endpoints beyond 2^53, e.g.
  nanosecond epochs — candidate pairs silently vanish even though the
  exact predicate is correct);
* bag semantics: duplicate input rows must yield duplicate pairs (the
  old dropDuplicates(all columns) collapsed them, diverging from a
  true theta join on non-distinct inputs);
* negative endpoints (pre-1970 epochs) must land in the right cell.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_kinesis_data_streams_replicator_spark.operators.joins import interval_overlap_join


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def _theta(spark, left, right):
    """Brute-force theta join oracle (fine at test scale)."""
    out = left.crossJoin(right).where(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    return out


def test_matches_theta_join_small(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 7), (3, 100, 120)], "lid int, ls long, le long"
    )
    right = spark.createDataFrame(
        [(10, 8, 12), (11, 50, 60), (12, 119, 119)],
        "rid int, rs long, re long",
    )
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", 7)
    want = _theta(spark, left, right)
    assert _pairs(got.select("lid", "rid")) == _pairs(
        want.select("lid", "rid")
    )


def test_negative_endpoints(spark):
    # pre-epoch intervals: floor(-3/10) must be -1, not 0 — a
    # truncating division would put [-3,-1] and [1,3] in the same cell
    # (harmless, extra candidates) but [-13,-11] vs [-3,-1] must still
    # MEET when they overlap a cell boundary
    left = spark.createDataFrame(
        [(1, -13, -4), (2, -3, 3)], "lid int, ls long, le long"
    )
    right = spark.createDataFrame(
        [(10, -5, -5), (11, 2, 8)], "rid int, rs long, re long"
    )
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", 10)
    want = _theta(spark, left, right)
    assert _pairs(got.select("lid", "rid")) == _pairs(
        want.select("lid", "rid")
    )


def test_beyond_2_53_endpoints_exact_cells(spark):
    # nanosecond-scale epochs: 2^53 + k is not representable as a
    # double for odd k, so F.floor(col / w) can mis-cell by one and
    # the equi-join silently loses the candidate pair.  These two
    # intervals overlap in exactly one point at 2^53 + 3.
    base = (1 << 53) + 3
    left = spark.createDataFrame(
        [(1, base - 4, base)], "lid int, ls long, le long"
    )
    right = spark.createDataFrame(
        [(10, base, base + 5)], "rid int, rs long, re long"
    )
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", 2)
    assert _pairs(got.select("lid", "rid")) == [(1, 10)]


def test_bag_semantics_duplicate_inputs(spark):
    # two IDENTICAL left rows must each pair with the right row —
    # a theta join returns 2 pairs, not 1
    left = spark.createDataFrame(
        [(0, 10), (0, 10)], "ls long, le long"
    )
    right = spark.createDataFrame([(5, 15)], "rs long, re long")
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", 4)
    assert got.count() == 2


def test_multi_cell_match_not_duplicated(spark):
    # one pair overlapping across MANY shared cells must come back once
    left = spark.createDataFrame([(1, 0, 100)], "lid int, ls long, le long")
    right = spark.createDataFrame([(10, 0, 100)], "rid int, rs long, re long")
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", 5)
    assert got.count() == 1
