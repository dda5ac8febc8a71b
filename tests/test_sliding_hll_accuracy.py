"""In-band accuracy watchdog for evt_sliding_hll_users (r10 ADVICE #4).

The parity hash only certifies the 12% boolean (≈7.5σ at lgK=12, so a
rung can never flake); an accuracy regression INSIDE that band — a
sketch misconfiguration drifting estimates from ~1% to ~8% error —
would stay parity-green forever.  This pytest pins the real envelope:
at sf0.001 every 6-hour window's HLL estimate must sit within 5% of
the exact distinct count, and the mean absolute error within 2.5%.
Those are >3× the lgK=12 standard error (~1.6%), loose enough for any
healthy DataSketches build, tight enough that a band-interior
regression fails HERE even while parity stays green.
"""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES

from conftest import SF_SMOKE


def test_hll_estimates_tight_within_band(spark):
    import pyspark.sql.functions as F

    e = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000"
            ).alias("eh"),
            "user_id",
        )
    )
    hourly = e.groupBy("eh").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    est = (
        hourly.select(
            F.explode(F.sequence(F.col("eh"), F.col("eh") + 5)).alias("h"),
            "sk",
        )
        .groupBy("h")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    exact = (
        e.select(
            F.explode(F.sequence(F.col("eh"), F.col("eh") + 5)).alias("h"),
            "user_id",
        )
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    deltas = [
        abs(r["est"] - r["n_exact"]) / r["n_exact"]
        for r in est.join(exact, "h").collect()
    ]
    assert deltas, "no windows produced"
    assert max(deltas) <= 0.05, f"worst window {max(deltas):.4f} > 5%"
    assert sum(deltas) / len(deltas) <= 0.025


def test_registered_query_still_emits_boolean(spark):
    df = QUERIES["evt_sliding_hll_users"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows and all(r["est_within_12pct"] for r in rows)
    # the r12 sub-band drift claim: suite-MEAN relative error ≤ 3%
    # (healthy lgK=12 ≈ 1.6%; a misconfigured sketch at ~8% flips
    # this parity-red, not just pytest-red)
    assert all(r["mean_err_within_3pct"] for r in rows)
