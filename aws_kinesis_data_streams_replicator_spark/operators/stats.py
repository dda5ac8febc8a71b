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


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Directional association rules A→B from the co-occurrence
    support pass: confidence = P(B|A) in basis points and lift =
    P(A∧B)/(P(A)·P(B)) ×1000, both integer-exact with cleared
    denominators — the full market-basket mining output
    (support/confidence/lift) that ``cooccurrence_pairs`` is the
    first stage of.

    Each unordered co-occurring pair emits BOTH directions (the two
    rules have different confidences); item marginals come from one
    bounded rollup joined back, the basket total is a 1-row broadcast.

    Scale notes: inherits the pair-generation bound from
    ``cooccurrence_pairs`` (Σ basket_size², support-filtered
    map-side); the marginal join keys on the antecedent item — a
    shuffle equi-join, broadcastable when the item dimension fits.
    No windows, no driver materialization."""
    base = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("item"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # |items|-row marginals join back twice (antecedent + consequent
    # side) — pinned so each side reads the rollup, not re-aggregates
    # the base pass (r12, guide §5)
    marg = base.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    ).localCheckpoint(eager=False)
    tot = base.select("g").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    # both direction legs of the union read the support pass — without
    # the pin the Σ basket² pair-generation join runs twice
    pairs = cooccurrence_pairs(
        df, group_col, item_col, min_support
    ).localCheckpoint(eager=False)
    rules = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        F.col("n_groups").alias("n_both"),
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            F.col("n_groups").alias("n_both"),
        )
    )
    return (
        rules.join(
            marg.select(
                F.col("item").alias("antecedent"),
                F.col("n_item").alias("n_antecedent"),
            ),
            "antecedent",
        )
        .join(
            marg.select(
                F.col("item").alias("consequent"),
                F.col("n_item").alias("n_consequent"),
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            "n_antecedent",
            "n_consequent",
            F.expr("CAST(n_both * 10000 DIV n_antecedent AS BIGINT)").alias(
                "confidence_bp"
            ),
            F.expr(
                "CAST(n_both * n_baskets * 1000 "
                "DIV (n_antecedent * n_consequent) AS BIGINT)"
            ).alias("lift_x1000"),
        )
    )
