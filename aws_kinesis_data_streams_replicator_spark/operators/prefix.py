"""Scale-safe EXACT global ordering primitives: row numbers, prefix
sums, and ntile buckets over a total order, without ever planning a
single-partition ``WindowExec``.

The classic forms — ``row_number().over(Window.orderBy(...))``,
``sum(x).over(Window.orderBy(...).rowsBetween(unboundedPreceding, ...))``,
``ntile(k).over(Window.orderBy(...))`` — are correct but serialize: an
empty partition spec forces every row through ONE task's sort.  At
100 TB that task is the straggler (or the OOM).  This module computes
the IDENTICAL values with the distributed decomposition every
MPP engine uses:

1. ``repartitionByRange`` on the total-order key — a range shuffle
   with sampled boundaries; rows with equal keys land in one
   partition, and the order keys used here always end in a unique
   tiebreak column, so partition boundaries can never split a tie.
2. Per-partition LOCAL row numbers / running sums — either free off
   ``monotonically_increasing_id`` (row-number only: the id encodes
   ``partition_id * 2^33 + local_offset`` in the materialized sorted
   order, so no further shuffle at all) or one window PARTITIONED BY
   the physical partition id (needed for running sums — a hash
   exchange on ≤P keys, each group one range-partition's rows).
3. Partition OFFSETS: one ≤P-row rollup (count + sum per partition
   id) windowed cumulatively — bounded by ``num_partitions`` BY
   CONSTRUCTION, the one global window this module ever plans, over
   the ``_pid`` summary — then broadcast-joined back.

``global_rn = offset(count) + local_rn`` and ``global_cum =
offset(sum) + local_cum`` are exact for any total order, independent
of where the sampled range boundaries fall.  A ``localCheckpoint``
(lazy) pins the materialized partitioning so the offset rollup and
the main branch see the same layout.

The plan-lint rule in tests/test_plan_lint.py recognizes the ``_pid``
summary window as bounded; everything else here is shuffle + hash
aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

# monotonically_increasing_id packs the partition id in the upper bits:
# id = partition_id * 2^33 + row_offset_within_partition
_MONO_PART_BITS = 33


def with_global_prefix(
    df: DataFrame,
    order_cols: Sequence[Column],
    rn_col: str = "rn",
    cum_cols: Sequence[str] = (),
    cum_suffix: str = "_cum",
    num_partitions: int | None = None,
    totals: bool = False,
) -> DataFrame:
    """Add an exact global row number (``rn_col``) — and, for each
    name in ``cum_cols``, an inclusive prefix sum ``<col><cum_suffix>``
    — over the total order given by ``order_cols`` (pass fully
    disambiguated sort expressions, e.g. ``[F.col("x").desc(),
    F.col("id")]`` — the final column MUST make the order total, or
    tie rows may straddle range-partition boundaries).

    Values are identical to
    ``row_number()/sum().over(Window.orderBy(*order_cols))`` but the
    plan is range-shuffle + per-partition work + a ≤P-row offset
    rollup, never a single-partition sort.

    ``totals=True`` additionally attaches ``_totn`` (global row count)
    and ``_tot_<c>`` (global sum of each cum col) to every row — read
    off the SAME ≤P-row partition rollup the offsets come from, so
    callers needing "rank plus total" (ntile, cumulative share) never
    pay a second scan of ``df`` for a count/sum the rollup already
    knows.
    """
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    if cum_cols:
        # running sums need an ordered walk per partition: one window
        # hash-partitioned on the ≤P distinct _pid values
        w_local = Window.partitionBy("_pid").orderBy(*order_cols)
        local = part.withColumn("_lrn", F.row_number().over(w_local))
        for c in cum_cols:
            local = local.withColumn(f"_lcum_{c}", F.sum(c).over(w_local))
    else:
        # row number only: the materialized sorted layout makes
        # monotonically_increasing_id's low bits the local offset —
        # zero additional shuffles
        local = part.withColumn(
            "_lrn",
            (
                F.monotonically_increasing_id().bitwiseAND(
                    F.lit((1 << _MONO_PART_BITS) - 1)
                )
                + 1
            ),
        )

    ptot = part.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_pn"),
        *[F.sum(c).alias(f"_ps_{c}") for c in cum_cols],
    )
    # bounded global window: ≤ num_partitions rows of the _pid summary
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot_cols = []
    if totals:
        tot_cols = [F.sum("_pn").over(w_all).alias("_totn")] + [
            F.sum(f"_ps_{c}").over(w_all).alias(f"_tot_{c}")
            for c in cum_cols
        ]
    offs = ptot.select(
        "_pid",
        F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_offn"),
        *[
            F.coalesce(F.sum(f"_ps_{c}").over(w_off), F.lit(0)).alias(
                f"_off_{c}"
            )
            for c in cum_cols
        ],
        *tot_cols,
    )
    out = local.join(F.broadcast(offs), "_pid").withColumn(
        rn_col, (F.col("_offn") + F.col("_lrn")).cast("long")
    )
    drop = ["_pid", "_lrn", "_offn"]
    for c in cum_cols:
        out = out.withColumn(
            f"{c}{cum_suffix}", F.col(f"_off_{c}") + F.col(f"_lcum_{c}")
        )
        drop += [f"_lcum_{c}", f"_off_{c}"]
    return out.drop(*drop)


def with_global_ntile(
    df: DataFrame,
    order_cols: Sequence[Column],
    n_buckets: int,
    bucket_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``bucket_col`` with values IDENTICAL to
    ``ntile(n_buckets).over(Window.orderBy(*order_cols))`` — the first
    ``n mod k`` buckets hold ``n div k + 1`` rows, the rest ``n div
    k`` — computed from the distributed global row number plus the
    total row count read off the SAME partition rollup as the rank
    offsets (no second scan of ``df``: with ntile chained 3× over one
    user rollup, a separate count pass re-executed the whole upstream
    chain each time), never a single-partition window.  ``order_cols``
    must end in a unique tiebreak (ntile ties are position-split, so
    the order must be total for determinism anyway)."""
    k = int(n_buckets)
    rn = "_ntile_rn"
    out = with_global_prefix(
        df, order_cols, rn_col=rn, num_partitions=num_partitions,
        totals=True,
    ).withColumnRenamed("_totn", "_ntile_n")
    # q = n div k, r = n mod k; first r buckets take q+1 rows:
    #   rn <= r*(q+1)  ->  (rn-1) div (q+1) + 1
    #   else           ->  r + 1 + (rn - r*(q+1) - 1) div q
    bucket = F.expr(
        f"CAST(CASE WHEN {rn} <= (_ntile_n % {k}) * (_ntile_n DIV {k} + 1) "
        f"THEN ({rn} - 1) DIV (_ntile_n DIV {k} + 1) + 1 "
        f"ELSE _ntile_n % {k} + 1 + "
        f"({rn} - (_ntile_n % {k}) * (_ntile_n DIV {k} + 1) - 1) "
        f"DIV (_ntile_n DIV {k}) END AS INT)"
    )
    return out.withColumn(bucket_col, bucket).drop(rn, "_ntile_n")


def with_global_prefix_max(
    df: DataFrame,
    order_cols: Sequence[Column],
    max_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = the EXCLUSIVE global running max of
    ``max_col`` over the total order given by ``order_cols`` (null on
    the globally first row) — values identical to
    ``max(c).over(Window.orderBy(*order_cols).rowsBetween(
    unboundedPreceding, -1))`` but decomposed exactly like
    ``with_global_prefix``: range shuffle, per-partition local
    exclusive running max, a ≤P-row per-partition max rollup whose
    bounded cumulative window yields each partition's offset (the max
    of every EARLIER partition), then ``greatest(local, offset)``.

    The skyline/dominance primitive: "best value among everything
    strictly before me in this order" without a single-partition
    WindowExec.  ``order_cols`` must end in a unique tiebreak."""
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn("_lmax", F.max(max_col).over(w_local))
    ptot = part.groupBy("_pid").agg(F.max(max_col).alias("_pm"))
    # bounded global window: ≤ num_partitions rows of the _pid summary
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = ptot.select("_pid", F.max("_pm").over(w_off).alias("_offm"))
    out = local.join(F.broadcast(offs), "_pid").withColumn(
        out_col,
        F.when(
            F.col("_lmax").isNull(), F.col("_offm")
        ).when(
            F.col("_offm").isNull(), F.col("_lmax")
        ).otherwise(F.greatest(F.col("_lmax"), F.col("_offm"))),
    )
    return out.drop("_pid", "_lmax", "_offm")
