"""The Arrow local-prefix pass (r12) against the window form it can
replace.

``with_global_prefix`` / ``with_global_prefix_max`` pick their
per-partition ordered walk by input size: the per-_pid window (one
hash exchange) for small inputs, the ``mapInArrow`` no-exchange pass
above ``spark.graft.prefix.arrowLocalPassMinBytes``.  Local test
frames are tiny, so without forcing ``arrow_local=True`` the Arrow
kernels would never execute in CI — these tests pin BOTH paths to the
single-partition window reference on data with nulls, negatives,
duplicates and narrow integer types, plus the size-gate's dispatch
itself.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from aws_kinesis_data_streams_replicator_spark.operators.prefix import (
    with_global_prefix,
    with_global_prefix_max,
)


def _fixture(spark):
    # nulls in the cum col, negatives, duplicate order keys broken by
    # a unique tiebreak, and an int (not long) value column
    return spark.sql(
        """
        SELECT id, k, CAST(v AS INT) AS v FROM VALUES
          (1, 3, 5), (2, 3, NULL), (3, 1, -7), (4, 2, NULL),
          (5, 2, 0), (6, 9, 4), (7, 0, NULL), (8, 0, -1),
          (9, 5, 100), (10, 5, -100), (11, 7, NULL), (12, 7, 3)
        AS t(id, k, v)
        """
    ).repartition(5)


def _expected_prefix(df):
    w = Window.orderBy("k", "id")
    return {
        r.id: (r.rn, r.vc)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("vc"),
        ).collect()
    }


def test_prefix_arrow_and_window_paths_match_reference(spark):
    df = _fixture(spark)
    want = _expected_prefix(df)
    for forced in (True, False):
        out = with_global_prefix(
            df,
            [F.col("k"), F.col("id")],
            rn_col="rn",
            cum_cols=["v"],
            num_partitions=4,
            arrow_local=forced,
        )
        got = {r.id: (r.rn, r.v_cum) for r in out.collect()}
        assert got == want, f"arrow_local={forced}: {got} != {want}"


def test_prefix_max_arrow_and_window_paths_match_reference(spark):
    df = _fixture(spark)
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.id: r.m for r in df.withColumn("m", F.max("v").over(w)).collect()
    }
    for forced in (True, False):
        out = with_global_prefix_max(
            df,
            [F.col("k"), F.col("id")],
            "v",
            "m",
            num_partitions=4,
            arrow_local=forced,
        )
        got = {r.id: r.m for r in out.collect()}
        assert got == want, f"arrow_local={forced}: {got} != {want}"
        # window MAX keeps the input type — so must the Arrow kernel
        assert dict(out.dtypes)["m"] == "int"


def test_prefix_arrow_totals_and_leading_null_run(spark):
    # a cum col whose FIRST rows in scan order are all null pins the
    # "null until first non-null" bookkeeping across batch boundaries
    df = spark.range(0, 500).select(
        F.col("id"),
        F.when(F.col("id") < 50, None)
        .otherwise((F.col("id") % 13).cast("long"))
        .alias("v"),
    )
    w = Window.orderBy("id")
    want = {
        r.id: (r.rn, r.vc, r.tn)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("vc"),
            F.count(F.lit(1))
            .over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("tn"),
        ).collect()
    }
    out = with_global_prefix(
        df,
        [F.col("id")],
        rn_col="rn",
        cum_cols=["v"],
        num_partitions=7,
        totals=True,
        arrow_local=True,
    )
    got = {r.id: (r.rn, r.v_cum, r._totn) for r in out.collect()}
    assert got == want


def test_size_gate_dispatch(spark):
    """The auto gate: tiny frames take the window path (no
    MapInArrow/ArrowEvalPython node), a forced-large threshold of 0
    takes the Arrow path."""
    df = _fixture(spark)
    plan_small = with_global_prefix(
        df, [F.col("k"), F.col("id")], rn_col="rn", cum_cols=["v"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan_small

    conf = "spark.graft.prefix.arrowLocalPassMinBytes"
    old = spark.conf.get(conf, None)
    spark.conf.set(conf, "0")
    try:
        plan_big = with_global_prefix(
            df, [F.col("k"), F.col("id")], rn_col="rn", cum_cols=["v"]
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
    assert "MapInArrow" in plan_big
