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


# --------------------------------------------------------------------------
# Position-based deletion vectors (merge-on-read soft delete)
# --------------------------------------------------------------------------

def _pos():
    # built lazily: column construction needs the classic/connect dispatch
    # that only resolves once a session exists
    return [
        F.col("_metadata.file_path").alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_pos"),
    ]


def position_deletes(scan: DataFrame, predicate) -> DataFrame:
    """Build a deletion vector for rows matching ``predicate``: the
    (file_path, row_index) positions Delta/Iceberg DVs record.  Narrow
    scan — only the predicate's columns plus constant-cost metadata are
    read; emitting positions instead of rewriting files is the whole
    point of the DV pattern (a delete touches KBs of bitmap, not TBs of
    parquet)."""
    return scan.where(predicate).select(*_pos())


def read_with_deletes(scan: DataFrame, dv: DataFrame) -> DataFrame:
    """Merge-on-read: survive = scan ANTI JOIN dv on position.

    At 100 TB the DV side is small-per-file bitmaps — Spark broadcasts
    it and the anti join never shuffles the base table.  (Real DV
    readers push the bitmap into the scan; the relational anti-join is
    the same plan one level up.)"""
    keyed = scan.select(*_pos(), "*")
    out = keyed.join(
        F.broadcast(dv), on=["_dv_file", "_dv_pos"], how="left_anti"
    )
    return out.drop("_dv_file", "_dv_pos")
