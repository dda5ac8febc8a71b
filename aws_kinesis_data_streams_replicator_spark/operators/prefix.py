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

# Spark's window SUM over any of these promotes to LongType; the Arrow
# local pass below reproduces that exactly (int64 accumulation).
_INTEGRAL_TYPES = ("byte", "short", "integer", "long")

# Size gate for the Arrow local-prefix pass (guide §1.1/§2.4, measured
# r12): replacing the per-_pid window's hash exchange with a mapInArrow
# scan trades a FULL second shuffle of the data (disk + network at
# cluster scale) for one local Arrow boundary crossing.  Measured on
# this box: the Arrow pass wins from ~1 GB of input (20M×5-col longs:
# 9.0s vs 10.4s best-of-3) but loses a ~0.3s per-query constant on
# sub-50 MB frames (Python stage setup dwarfs a 32-partition local
# exchange).  So the choice is derived from the INPUT SIZE — the same
# shape as autoBroadcastJoinThreshold, adaptive to scale rather than
# tuned to either local mode or the cluster.  Unknown statistics
# (e.g. checkpoint-derived lineage reporting defaultSizeInBytes)
# count as large — the scale-safe direction; callers whose input is
# metadata-scale BY CONSTRUCTION pass ``arrow_local=False`` instead.
_ARROW_MIN_BYTES_CONF = "spark.graft.prefix.arrowLocalPassMinBytes"
_ARROW_MIN_BYTES_DEFAULT = 256 * 1024 * 1024


def _use_arrow_local_pass(
    df: DataFrame, cols: Sequence[str], arrow_local: "bool | None"
) -> bool:
    """Whether the per-partition ordered walk should run as the Arrow
    local pass (no exchange) instead of the per-_pid window (one hash
    exchange of the full input).  Exactness gate first — only integral
    columns accumulate bit-identically in int64 — then the explicit
    override, then the size threshold."""
    dtypes = {f.name: f.dataType.typeName() for f in df.schema.fields}
    if not all(dtypes[str(c)] in _INTEGRAL_TYPES for c in cols):
        return False
    if arrow_local is not None:
        return bool(arrow_local)
    threshold = int(
        df.sparkSession.conf.get(
            _ARROW_MIN_BYTES_CONF, str(_ARROW_MIN_BYTES_DEFAULT)
        )
    )
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = 1 << 62  # unknown: assume large (scale-safe)
    return est >= threshold


def _local_prefix_arrow(part: DataFrame, cum_cols: Sequence[str]) -> DataFrame:
    """Per-partition local row numbers + inclusive running sums of the
    (integral) ``cum_cols``, computed in ONE ``mapInArrow`` pass over
    the materialized range layout — NO exchange.

    The previous form, ``Window.partitionBy("_pid")``, forced a full
    hash exchange of the data: the checkpointed range layout exposes
    no partitioning to the planner, so every prefix call shuffled its
    input TWICE (range shuffle + the window's hash shuffle).  Rows in
    each physical partition already arrive in sorted order, so the
    running sums are a sequential scan (r12, guide §2.4).

    Exactness: int64 accumulation end-to-end (Arrow int64 → numpy
    int64 cumsum), identical to the JVM window's LongType sum — which
    is why this path is gated to integral cum cols (float sums are
    order-of-association-sensitive and batch chunking would change the
    association).  NULL semantics match the window sum: a row's
    running sum is NULL until the first non-null value in scan order.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    cum = [str(c) for c in cum_cols]

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n0 = 0
        run = {c: 0 for c in cum}
        nnz = {c: 0 for c in cum}
        for b in batches:
            k = b.num_rows
            names = b.schema.names
            out_cols = list(b.columns)
            out_cols.append(pa.array(np.arange(n0 + 1, n0 + k + 1, dtype=np.int64)))
            n0 += k
            for c in cum:
                arr = b.column(names.index(c))
                valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                filled = (
                    pc.fill_null(arr, 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                )
                cs = filled.cumsum() + run[c]
                cn = valid.cumsum() + nnz[c]
                out_cols.append(pa.array(cs, type=pa.int64(), mask=cn == 0))
                if k:
                    run[c] = int(cs[-1])
                    nnz[c] = int(cn[-1])
            yield pa.RecordBatch.from_arrays(
                out_cols, names=names + ["_lrn"] + [f"_lcum_{c}" for c in cum]
            )

    out_schema = StructType(
        list(part.schema.fields)
        + [StructField("_lrn", LongType())]
        + [StructField(f"_lcum_{c}", LongType()) for c in cum]
    )
    return part.mapInArrow(kernel, out_schema)


def _local_prefix_max_arrow(part: DataFrame, max_col: str) -> DataFrame:
    """Per-partition EXCLUSIVE running max of the (integral)
    ``max_col`` in ONE ``mapInArrow`` pass over the materialized range
    layout — NO exchange (same rationale and int64 gating as
    ``_local_prefix_arrow``).

    Semantics match ``max(c).over(partitionBy(_pid).orderBy(...)
    .rowsBetween(unboundedPreceding, -1))`` exactly: a row's ``_lmax``
    is the max of the NON-NULL values strictly before it in scan
    order, NULL until one exists.  The output keeps ``max_col``'s own
    type (window MAX does not promote, unlike SUM) so the downstream
    ``greatest(local, offset)`` stays in the original type.
    """
    from pyspark.sql.types import StructField, StructType

    field = part.schema[max_col]

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        i64_min = np.int64(np.iinfo(np.int64).min)
        best = i64_min  # running inclusive max; meaningful once nnz > 0
        nnz = 0
        for b in batches:
            k = b.num_rows
            names = b.schema.names
            out_cols = list(b.columns)
            arr = b.column(names.index(max_col))
            if k:
                valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                filled = (
                    pc.fill_null(arr, 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                )
                vals = np.where(valid, filled, i64_min)
                incl = np.maximum(np.maximum.accumulate(vals), best)
                excl = np.empty(k, dtype=np.int64)
                excl[0] = best
                excl[1:] = incl[:-1]
                vcs = valid.cumsum()
                nnz_excl = np.empty(k, dtype=np.int64)
                nnz_excl[0] = 0
                nnz_excl[1:] = vcs[:-1]
                nnz_excl += nnz
                mask = nnz_excl == 0
                excl[mask] = 0  # scrub sentinel before narrowing cast
                out_cols.append(pa.array(excl, type=arr.type, mask=mask))
                best = np.int64(incl[-1])
                nnz += int(vcs[-1])
            else:
                out_cols.append(pa.array([], type=arr.type))
            yield pa.RecordBatch.from_arrays(out_cols, names=names + ["_lmax"])

    out_schema = StructType(
        list(part.schema.fields) + [StructField("_lmax", field.dataType)]
    )
    return part.mapInArrow(kernel, out_schema)


def with_global_prefix(
    df: DataFrame,
    order_cols: Sequence[Column],
    rn_col: str = "rn",
    cum_cols: Sequence[str] = (),
    cum_suffix: str = "_cum",
    num_partitions: int | None = None,
    totals: bool = False,
    arrow_local: bool | None = None,
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

    ``arrow_local`` picks the local-pass implementation for the
    running sums: ``None`` (default) chooses by input size — the
    Arrow no-exchange pass above
    ``spark.graft.prefix.arrowLocalPassMinBytes`` (default 256 MB),
    the per-_pid window below it; ``True``/``False`` force one side
    (callers whose input is metadata-scale by construction pass
    ``False``).
    """
    use_arrow = bool(cum_cols) and _use_arrow_local_pass(
        df, [str(c) for c in cum_cols], arrow_local
    )
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
        if use_arrow:
            # ordered per-partition walk WITHOUT an exchange — see
            # _local_prefix_arrow (the window form re-shuffles the
            # whole input on _pid)
            local = _local_prefix_arrow(part, cum_cols)
        else:
            # small input (or floats/decimals, which keep the JVM's
            # own accumulation order): one hash exchange on the ≤P
            # distinct _pid values
            w_local = Window.partitionBy("_pid").orderBy(*order_cols)
            local = part.withColumn("_lrn", F.row_number().over(w_local))
            for c in cum_cols:
                local = local.withColumn(
                    f"_lcum_{c}", F.sum(c).over(w_local)
                )
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
        # per-partition non-null counts: a row whose LOCAL running sum
        # is null (leading null run in its partition) still has a
        # non-null GLOBAL running sum when any earlier partition held
        # a value — the combine below needs to tell those apart
        *[F.count(c).alias(f"_pnn_{c}") for c in cum_cols],
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
        *[
            F.coalesce(F.sum(f"_pnn_{c}").over(w_off), F.lit(0)).alias(
                f"_offnn_{c}"
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
        # window-exact null semantics: the running sum is null only
        # while NO non-null value precedes the row globally — a null
        # local cum with values in earlier partitions takes the offset
        out = out.withColumn(
            f"{c}{cum_suffix}",
            F.when(
                F.col(f"_lcum_{c}").isNotNull(),
                F.col(f"_off_{c}") + F.col(f"_lcum_{c}"),
            ).when(F.col(f"_offnn_{c}") > 0, F.col(f"_off_{c}")),
        )
        drop += [f"_lcum_{c}", f"_off_{c}", f"_offnn_{c}"]
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
    arrow_local: bool | None = None,
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
    WindowExec.  ``order_cols`` must end in a unique tiebreak.
    ``arrow_local`` as in ``with_global_prefix``."""
    use_arrow = _use_arrow_local_pass(df, [max_col], arrow_local)
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
    if use_arrow:
        # local exclusive running max in one Arrow pass over the
        # materialized range layout — no exchange (same rationale and
        # gating as _local_prefix_arrow; max is associative so only
        # the null/exclusive bookkeeping needs care)
        local = _local_prefix_max_arrow(part, max_col)
    else:
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
