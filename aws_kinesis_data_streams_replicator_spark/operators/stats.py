"""Exact distributional statistics over event values — anomaly flagging
without floats.

The 3σ rule compares |x − μ| against 3σ, but μ and σ are ratios of
integer sums, so the comparison clears denominators instead of dividing:

    |x − S/n| > 3·σ   with   σ² = (n·Q − S²)/n²
    ⟺ (n·x − S)² > 9·(n·Q − S²)

where S = Σx, Q = Σx² over the group — every side an exact integer
(values quantized to cents via ``floor(value·100)``; floor of the same
IEEE double is bit-identical across engines, no rounding-rule
divergence).  The squares reach ~10²¹ at sf1, past int64 — they're
computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both exact.

Scale notes (100 TB): two passes — a map-side-combined aggregation down
to |event_type| stat rows, broadcast back over the raw scan, then the
final per-type rollup.  No wide shuffle at all; the raw table is scanned
twice (stats pass + flag pass), the standard trade for exact two-pass
z-scores.  Skew-free: the broadcast join has no shuffle and the final
aggregation keys on event_type (bounded cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CENTS = "CAST(floor(value * 100) AS BIGINT)"


def sigma_outlier_counts(events: DataFrame, k_sigma: int = 3) -> DataFrame:
    """Per-event-type count of |x − μ| > kσ outliers, exact integers."""
    ev = events.select("event_type", F.expr(CENTS).alias("cents"))
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    dev = "(CAST(n AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0)))"
    var_n2 = (
        "(CAST(n AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))"
        " - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))"
    )
    is_out = F.expr(f"{dev} * {dev} > {k_sigma * k_sigma} * {var_n2}")
    return (
        j.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.sum(is_out.cast("long")).cast("long").alias("n_outliers"),
            F.max("s").alias("sum_cents"),
            F.expr("max(s) DIV max(n)").alias("mean_cents"),
        )
        .select("event_type", "n_events", "n_outliers", "sum_cents", "mean_cents")
    )
