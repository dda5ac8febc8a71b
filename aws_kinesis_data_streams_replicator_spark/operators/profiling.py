"""Data profiling + expectation checking — the admission control in
front of a training-data pipeline (Deequ-style, DataFrame-native).

``profile_table`` computes per-column completeness/cardinality/range in
ONE aggregation pass (every metric is an agg expression over the same
scan — no per-column jobs, which at 100 TB would mean N full scans).
``check_rules`` evaluates boolean expectations as summed flags in one
pass, plus optional referential checks as broadcast anti-join counts.

Scale notes (100 TB): one map-side-combined aggregation each; distinct
counts use approx_count_distinct (exact distinct per column would be a
shuffle per column — the profiler's documented trade; the oracle query
therefore pins only the exact metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: rows, nulls, exact distincts, min/max as
    strings — one wide aggregation, then an unpivot to (column, metric)
    rows.

    The distinct counts run in their OWN aggregation, cross-joined back
    to the plain min/max/null aggregation: mixing count(DISTINCT) with
    non-distinct aggregates in one agg makes Spark route everything
    through the multi-distinct expand rewrite, which disables map-side
    partial aggregation for the plain metrics — measured 3× slower than
    the two-agg + broadcast-join form on sf0.1 orders (3.4 s vs 1.1 s).
    Swap count_distinct to approx_count_distinct for continuous
    monitoring.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nulls"),
            # min/max in the column's NATIVE ordering, cast to string
            # after — casting first would rank '9' above '14999'
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    d_aggs = [
        F.count_distinct(F.col(c)).cast("long").alias(f"{c}__distinct")
        for c in cols
    ]
    wide = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*d_aggs)))
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct, min_s, max_s)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")


def check_rules(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Expectation suite: ``{rule_name: boolean SQL}`` → one row per rule
    with violation count and a pass flag.  All rules evaluate in a single
    scan (each is a summed CASE over the same rows)."""
    if not rules:
        raise ValueError("check_rules: rules must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        F.sum((~F.expr(sql_pred)).cast("long")).cast("long").alias(f"v__{name}")
        for name, sql_pred in rules.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        "'{}', v__{}".format(name.replace("'", "''"), name)
        for name in rules
    )
    out = wide.select(
        "n_rows",
        F.expr(f"stack({len(rules)}, {stack}) AS (rule_name, n_violations)"),
    )
    return out.select(
        "rule_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def check_referential_multi(
    fact: DataFrame, checks: list[tuple[str, DataFrame, str, str]]
) -> DataFrame:
    """Referential-integrity expectations for SEVERAL foreign keys of the
    SAME fact table in ONE fact scan: each dimension's distinct keys are
    broadcast LEFT-joined (independent probes over the same rows), then a
    single aggregate counts null-probe rows per edge and a ``stack``
    unpivots to one row per rule.  Semantically identical to unioning
    per-edge ``check_referential`` results — but N independent FK checks
    cost ONE pass over the fact instead of N (at 100 TB, N−1 saved
    corpus scans).

    ``checks``: list of ``(fact_key, dim, dim_key, rule_name)``.
    """
    if not checks:
        # stack(0, ) is invalid SQL — fail here with a real message
        raise ValueError("check_referential_multi: checks must be non-empty")
    # ordered dedup (a set literal would make column order — and so the
    # plan fingerprint — depend on Python hash randomization)
    probed = fact.select(*dict.fromkeys(fk for fk, _, _, _ in checks))
    for i, (fk, dim, dk, _) in enumerate(checks):
        dimk = dim.select(F.col(dk).alias(f"__dim_key_{i}")).distinct()
        probed = probed.join(
            F.broadcast(dimk),
            F.col(fk) == F.col(f"__dim_key_{i}"),
            "left",
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        F.sum(F.when(F.col(f"__dim_key_{i}").isNull(), 1).otherwise(0))
        .cast("long")
        .alias(f"v__{i}")
        for i in range(len(checks))
    ]
    wide = probed.agg(*aggs)
    # rule names are caller literals, but escape anyway (r12 ADVICE):
    # a quote in a name must not break — or inject into — the stack()
    stack = ", ".join(
        "'{}', v__{}".format(name.replace("'", "''"), i)
        for i, (_, _, _, name) in enumerate(checks)
    )
    return wide.select(
        "n_rows",
        F.expr(f"stack({len(checks)}, {stack}) AS (rule_name, n_violations)"),
    ).select(
        "rule_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def check_referential(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, rule_name: str
) -> DataFrame:
    """Referential-integrity expectation: count fact rows whose key has
    no match in the dimension, in ONE fact scan — broadcast LEFT join
    against the distinct dim keys, then a single aggregate counting
    null-probe rows.  (The two-subquery formulation scans the fact twice
    and cross-joins two 1-row frames; one scan + one agg is the 100 TB
    plan.)"""
    dimk = dim.select(F.col(dim_key).alias("__dim_key")).distinct()
    probed = fact.select(F.col(fact_key).alias("__fact_key")).join(
        F.broadcast(dimk), F.col("__fact_key") == F.col("__dim_key"), "left"
    )
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__dim_key").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
    ).select(
        F.lit(rule_name).alias("rule_name"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )
