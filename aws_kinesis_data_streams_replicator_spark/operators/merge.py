"""Batch MERGE (upsert) — the table-maintenance primitive behind CDC
ingestion and training-corpus refreshes.

Spark without a lakehouse format has no MERGE INTO; the equivalent
relational plan is a FULL OUTER join on the merge key with source-wins
column resolution: matched rows take the source's values (UPDATE),
source-only rows appear (INSERT), target-only rows persist (keep).
That is exactly what Delta/Iceberg compile MERGE into before file
rewriting, so the shape carries to 100 TB unchanged: one shuffle on the
merge key (or zero with co-bucketed tables), source side broadcast when
small.

The streaming twin — per-micro-batch idempotent upsert — lives in
streaming/sinks.py (checkpoint table); this is the batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    with_action: bool = False,
) -> DataFrame:
    """MERGE source INTO target ON key: update-when-matched (source
    wins), insert-when-not-matched, keep unmatched target rows.

    Both sides must share a schema.  With ``with_action`` the output
    carries the per-row MERGE verdict (updated/inserted/kept) — the
    audit column a CDC pipeline logs.
    """
    value_cols = [c for c in target.columns if c != key]
    if set(source.columns) != set(target.columns):
        raise ValueError("merge_upsert requires identical schemas")
    t, s = target.alias("t"), source.alias("s")
    merged = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    out = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key),
        *[
            F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
            for c in value_cols
        ],
    ]
    if with_action:
        out.append(
            F.when(F.col(f"s.{key}").isNull(), F.lit("kept"))
            .when(F.col(f"t.{key}").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("merge_action")
        )
    return merged.select(*out)
