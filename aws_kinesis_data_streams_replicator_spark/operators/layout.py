"""Multi-dimensional file layout (Z-ordering) for scan pruning.

At 100 TB the fastest query is the one that never reads the file: parquet
row-group/file min-max statistics prune scans, but only if the data
layout makes per-file ranges NARROW on the filter columns.  Sorting by a
single column gives perfect pruning on that column and none on others;
interleaving the bits of several columns (a Z-/Morton curve) gives good
pruning on ALL of them simultaneously — the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Implemented with pure JVM bit arithmetic (shiftleft/or inside
whole-stage codegen) + ``repartitionByRange`` on the curve value, so the
cluster sorts once and every written file covers a compact Z-range.

Scale notes: range partitioning samples the curve values to build
balanced splits — one extra job over a sample, then one total-sort
shuffle; this is exactly how a layout-optimization job (compaction /
OPTIMIZE) runs on a real table, amortized over many subsequent reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _grid_normalize(df: DataFrame, col: str, bits: int) -> Column:
    """Scale a column to [0, 2^bits) grid cells via min-max equi-width
    binning.  min/max come from one distributed aggregate (never a
    global sort — a rank-based normalization would need one); heavy skew
    degrades cell balance but not correctness, and repartitionByRange on
    the final Z value re-balances the FILES regardless."""
    lo, hi = df.agg(
        F.min(col).cast("double"), F.max(col).cast("double")
    ).first()
    cells = 1 << bits
    if hi is None or lo is None or hi == lo:
        return F.lit(0).cast("long")
    return F.least(
        F.lit(cells - 1),
        F.width_bucket(F.col(col).cast("double"), F.lit(lo), F.lit(hi), F.lit(cells))
        - 1,
    ).cast("long")


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative longs into a
    Morton (Z-curve) value: x's bit i lands at position 2i, y's at 2i+1.
    Pure shiftleft/and/or — stays inside whole-stage codegen."""
    terms = []
    for i in range(bits):
        xbit = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ybit = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        terms.append(xbit)
        terms.append(ybit)
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of (col_x, col_y).

    Each output file then covers a compact square-ish region of the
    (x, y) domain, so min-max stats prune file scans for predicates on
    EITHER or BOTH columns — versus a linear sort, which prunes only its
    leading column.
    """
    zed = (
        df.withColumn("_zx", _grid_normalize(df, col_x, bits))
        .withColumn("_zy", _grid_normalize(df, col_y, bits))
        .withColumn("_z", z_value(F.col("_zx"), F.col("_zy"), bits))
    )
    (
        zed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_zx", "_zy", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )
