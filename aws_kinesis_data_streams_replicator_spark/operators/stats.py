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


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence: (item_a, item_b, n_groups) for every
    unordered item pair appearing together in ≥ ``min_support`` groups —
    the support-counting pass of association mining (and the document
    co-citation / tag co-occurrence primitive).

    Distinct (group, item) first, then a per-group self-join with
    ``item_a < item_b`` so each unordered pair is generated exactly once
    and never paired with itself.  Pair generation is Σ basket_size² —
    safe when basket size is bounded (TPC-H orders hold ≤ 7 parts;
    at 100 TB cap pathological baskets with the same windowed-limit
    guard ngram_jaccard_pairs uses for hot shingles, operators/dedup.py)
    — and the support filter runs map-side-combined before anything
    wide.  No driver materialization at any point."""
    base = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("item"))
        .distinct()
    )
    a = base.select("g", F.col("item").alias("item_a"))
    b = base.select("g", F.col("item").alias("item_b"))
    pairs = a.join(b, "g").where(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
        .where(F.col("n_groups") >= min_support)
    )
