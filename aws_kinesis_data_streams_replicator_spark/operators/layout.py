"""Multi-dimensional data layout: Z-order (Morton) clustering and the
min-max pruning arithmetic that justifies it.

Why this exists at 100 TB: a table laid out in ingestion order prunes
parquet row groups well on the ingestion key and not at all on any
other column; sorting by a single column just moves the problem.
Interleaving the bits of two (or more) keys into one Z-value and
range-bucketing files by it gives every interleaved dimension
locality, so a point or range predicate on EITHER column skips most
files on min-max statistics alone — the technique behind every
"OPTIMIZE ZORDER BY"-style layout command.

Everything here is integer arithmetic (div/mod/multiply — no bit
intrinsics), deliberately: the identical expression runs on any SQL
engine, which is also how the oracle checks it."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .prefix import with_global_prefix

ZORDER_BITS = 16


def zvalue_sql(x_sql: str, y_sql: str, bits: int = ZORDER_BITS,
               div: str = "DIV") -> str:
    """SQL for the Morton interleave of two ``bits``-bit nonnegative
    ints: bit b of x lands at position 2b, bit b of y at 2b+1.  Pure
    div/mod/multiply so the SAME construction (modulo the integer-
    division token — ``DIV`` for Spark, ``//`` for DuckDB) runs on
    both engines; inputs must already be folded into [0, 2^bits)."""
    terms = []
    for b in range(bits):
        terms.append(f"(({x_sql}) {div} {1 << b}) % 2 * {1 << (2 * b)}")
        terms.append(f"(({y_sql}) {div} {1 << b}) % 2 * {1 << (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"


def zvalue(x_sql: str, y_sql: str, bits: int = ZORDER_BITS) -> Column:
    """Spark column for the Morton interleave — see ``zvalue_sql``."""
    return F.expr(zvalue_sql(x_sql, y_sql, bits, div="DIV"))


def range_bucket_sql(
    value_sql: str, max_plus_1_sql: str, n_buckets: int, div: str = "DIV"
) -> str:
    """SQL assigning ``value`` ∈ [0, max_plus_1) to one of
    ``n_buckets`` contiguous range buckets — the file-assignment rule
    for a layout sorted by ``value`` (z-value for a Z-order layout,
    ingestion key for the baseline).  Integer ``value * n DIV (max+1)``
    stays exact in int64 for values < 2^(63−lg n); like
    ``zvalue_sql``, the same text runs on both engines modulo the
    division token."""
    return (
        f"CAST(({value_sql}) * {n_buckets} {div} ({max_plus_1_sql}) "
        f"AS BIGINT)"
    )


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
        F.width_bucket(
            F.col(col).cast("double"), F.lit(lo), F.lit(hi), F.lit(cells)
        )
        - 1,
    ).cast("long")


def z_value(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative longs into a
    Morton (Z-curve) value: x's bit i lands at position 2i, y's at 2i+1.
    Column-object twin of ``zvalue`` (shiftleft/and/or — same codegen
    class as the div/mod form, for callers holding Columns rather than
    SQL text)."""
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
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of (col_x,
    col_y) — the PHYSICAL half of the layout family
    (``layout_pruning_stats`` below is the advisor that predicts what
    this write buys).

    Each output file covers a compact square-ish region of the (x, y)
    domain, so min-max stats prune file scans for predicates on EITHER
    or BOTH columns — versus a linear sort, which prunes only its
    leading column.  Range partitioning samples the curve values to
    build balanced splits — one extra job over a sample, then one
    total-sort shuffle; exactly how a layout-optimization (compaction /
    OPTIMIZE) job runs on a real table, amortized over many
    subsequent reads."""
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


def write_hilbert_ordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the HILBERT curve of
    (col_x, col_y) — the physical half whose payoff
    ``files_hilbert_pruning`` prices against Z-order and ingestion
    order.  Same shape as ``write_zordered`` (min-max grid
    normalization, range-partitioned total sort on the curve value),
    but the curve index comes from the broadcast ``hilbert_lookup``
    join (see its docstring — the per-row expression form explodes
    under projection collapse), so Hilbert's tighter every-step
    adjacency buys tighter per-file boxes at unaligned file counts
    with the identical write cost."""
    gridded = df.withColumn(
        "_hgx", _grid_normalize(df, col_x, bits)
    ).withColumn("_hgy", _grid_normalize(df, col_y, bits))
    hed = with_hilbert(gridded, "_hgx", "_hgy", out="_h", bits=bits)
    (
        hed.repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_hgx", "_hgy", "_h")
        .write.mode("overwrite")
        .parquet(path)
    )


def layout_pruning_stats(
    df: DataFrame,
    assignments: list[tuple[str, str, Column, Column]],
    domains: "list[str] | dict" = (),
    include_rows: bool = False,
) -> DataFrame:
    """Min-max pruning effectiveness of competing file layouts, exactly.

    ``assignments`` rows are (layout_name, dim_name, file_col,
    value_col): which file each record lands in under that layout, and
    the dimension value whose per-file min-max range a reader would
    prune on.  A dimension's global width (max − min + 1 of its value
    column) is derived from the per-file rollup itself — every
    assignment covers every row of ``df``, so ``max(hi) − min(lo) + 1``
    over a dim's files IS the global span of its value column.  (r12
    optimization, guide §2.4: the previous form took the domains as
    Columns and aggregated them in a SECOND full pass over ``df`` —
    for composed inputs like the lifecycle's assigned fact frame that
    pass replayed the entire upstream chain.)  ``domains`` is kept for
    call-site readability (the dim names being audited) but no longer
    carries expressions.

    For every (layout, dim): per-file [min, max] spans, then
    ``span_sum = Σ(max−min+1)`` — the exact expected number of files a
    uniform random point predicate must touch is span_sum/domain,
    emitted as ``expected_files_hit_bp`` (×10⁴).  One explode + two
    hash aggregations, ONE pass over ``df``; no windows, no collects —
    the measurement itself follows the engine's scale rules.

    ``include_rows=True`` appends an ``n_rows`` column (rows assigned
    per layout/dim) — the conservation witness a lifecycle audit wants
    (every layout must account for every row; a silent drop in a file
    assignment shows up as a cross-layout n_rows mismatch).  Off by
    default so existing advisor schemas stay frozen."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(layout).alias("layout"),
                        F.lit(dim).alias("dim"),
                        fcol.cast("long").alias("file_id"),
                        vcol.cast("long").alias("val"),
                    )
                    for layout, dim, fcol, vcol in assignments
                ]
            )
        ).alias("t")
    ).select("t.*")
    # metadata-scale (files × layouts × dims rows); pinned because BOTH
    # the per-layout rollup and the domain derivation read it — without
    # the pin each consumer replays the fact pass
    per_file = (
        stacked.groupBy("layout", "dim", "file_id")
        .agg(
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
            F.count(F.lit(1)).alias("nr"),
        )
        .localCheckpoint(eager=False)
    )
    per_layout = per_file.groupBy("layout", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.col("hi") - F.col("lo") + 1).cast("long").alias("span_sum"),
        F.sum("nr").cast("long").alias("_n_rows"),
    )
    dom = per_file.groupBy("dim").agg(
        (F.max("hi") - F.min("lo") + 1).cast("long").alias("_dom")
    )
    out = per_layout.join(F.broadcast(dom), "dim").select(
        "layout",
        "dim",
        "n_files",
        "span_sum",
        F.expr("CAST(span_sum * 10000 DIV _dom AS BIGINT)").alias(
            "expected_files_hit_bp"
        ),
        F.col("_n_rows").alias("n_rows"),
    )
    if not include_rows:
        out = out.drop("n_rows")
    return out


def execute_compaction_bins(
    table: DataFrame,
    bins: DataFrame,
    key_col: str,
    out_dir: str,
) -> None:
    """Execute a compaction work list (``compaction_plan`` /
    ``compaction_step`` output): rewrite each bin's key range as ONE
    key-sorted parquet file under ``out_dir/bin=<id>/`` — the rewrite
    half of OPTIMIZE, in a single distributed job (no driver loop over
    bins):

    * bins are metadata (bounded per maintenance cycle) → broadcast
      range join assigns every row its bin;
    * hash-repartition on the bin id puts each bin's rows in one task;
    * ``sortWithinPartitions(bin, key)`` keeps every output file
      key-clustered, so downstream min-max pruning sees contiguous
      spans (``layout_pruning_stats`` audits exactly this);
    * ``partitionBy("bin")`` writes one file per bin directory.

    Reads the table once however many bins close; the per-file
    open/footer cost the small ingest files paid is amortized away.

    CONTRACT: bins must come from ONE planning pass (compaction_plan,
    or a single flushed compaction_step), where key ranges are
    globally disjoint.  Bins accumulated across INCREMENTAL epochs can
    have overlapping [first_key, last_key] ranges (a later epoch's
    inventory interleaves the carried tail with new keys), and a range
    join would then assign a row to two bins — use
    :func:`execute_compaction_filelist` with the per-file work list
    for the incremental path."""
    b = bins.select("bin", "first_key", "last_key")
    assigned = table.join(
        F.broadcast(b),
        (table[key_col] >= F.col("first_key"))
        & (table[key_col] <= F.col("last_key")),
    ).drop("first_key", "last_key")
    (
        assigned.repartition("bin")
        .sortWithinPartitions("bin", key_col)
        .write.mode("overwrite")
        .partitionBy("bin")
        .parquet(out_dir)
    )


def execute_compaction_filelist(
    table: DataFrame,
    file_bins: DataFrame,
    key_col: str,
    out_dir: str,
    path_col: str = "path",
) -> None:
    """Execute an INCREMENTAL compaction work list by exact file
    membership — the rewrite half of the streaming maintenance job
    (``compaction_step_detail`` / ``streaming_compaction_maintenance``
    emit one (file, bin) row per closed file under ``work_dir/files``).

    Unlike :func:`execute_compaction_bins`' key-range join, explicit
    membership survives overlapping key ranges across emission epochs
    (the Iceberg/Delta OPTIMIZE shape: rewrite FILE GROUPS, not key
    predicates): every physical file belongs to exactly one bin, so
    every row is rewritten exactly once.

    * ``table`` must be a direct parquet scan (the join key is the
      row's ``_metadata.file_path``); ``file_bins`` is metadata (files
      closed this maintenance cycle, carrying ``path``, ``bin`` and
      the file-level ``key_col``) → broadcast equi-join; rows of files
      still in the open tail simply don't match and are left in place;
    * hash-repartition on the bin id + ``sortWithinPartitions(bin,
      file key)`` keeps every output file clustered in file-run
      order (rows inside each source file were already written
      curve-sorted);
    * ``partitionBy("bin")`` writes one directory per bin."""
    fb = file_bins.select(
        F.col(path_col).alias("_fb_path"),
        "bin",
        F.col(key_col).alias("_fb_key"),
    )
    assigned = table.withColumn(
        "_row_path", F.col("_metadata.file_path")
    ).join(
        F.broadcast(fb), F.col("_row_path") == F.col("_fb_path")
    ).drop("_fb_path", "_row_path")
    (
        assigned.repartition("bin")
        .sortWithinPartitions("bin", "_fb_key")
        .drop("_fb_key")
        .write.mode("overwrite")
        .partitionBy("bin")
        .parquet(out_dir)
    )


def compaction_plan(
    files: DataFrame,
    key_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Plan a small-file compaction: pack a sorted file inventory into
    contiguous bins of ~``target_bytes`` each — the planning half of
    the OPTIMIZE/binpack job every incrementally-ingested table needs
    (micro-batch ingest leaves one small file per trigger; reads then
    pay per-file open/footer costs that dwarf the data).

    Files are walked in ``key_col`` order (ingestion/cluster key, must
    be unique per file) and assigned ``bin = exclusive_prefix_bytes DIV
    target_bytes`` — first-fit in sort order, so each output bin merges
    ADJACENT files and the table's range clustering survives
    compaction (a size-sorted packing would destroy it).  A file
    larger than ``target_bytes`` keeps its bin to itself plus whatever
    tail space the rule grants — the standard binpack behavior.

    Returns one row per bin: ``bin, n_files, total_bytes, first/last
    key`` — the work list a rewrite job (e.g. ``write_zordered``) then
    executes per bin.

    Scale notes: the inventory is file METADATA (one row per file —
    ~10⁵ rows for a 100 TB table), but the prefix sum still uses the
    distributed range-shuffle decomposition (operators/prefix.py), so
    even a 10⁸-file inventory never plans a single-partition window."""
    binned = _binned_files(files, key_col, size_col, target_bytes)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(size_col).cast("long").alias("total_bytes"),
        F.min(key_col).alias("first_key"),
        F.max(key_col).alias("last_key"),
    )


def _binned_files(
    files: DataFrame, key_col: str, size_col: str, target_bytes: int
) -> DataFrame:
    """Per-file bin assignment of ``compaction_plan`` (the distributed
    prefix sum + ``bin = exclusive_prefix DIV target``), kept separate
    so the incremental step can SPLIT an inventory at the open bin."""
    ordered = with_global_prefix(
        files,
        [F.col(key_col)],
        rn_col="_file_rn",
        cum_cols=[size_col],
        cum_suffix="_cum",
        # file inventories are metadata-scale BY CONSTRUCTION (one row
        # per file, ~1e5 rows even at 100 TB with 1 GB files), and
        # checkpoint-derived lineage reports unknown stats — force the
        # window form rather than let "unknown → large" pick the Arrow
        # pass for a frame that never warrants it
        arrow_local=False,
    )
    return ordered.withColumn(
        "bin",
        F.expr(
            f"CAST(({size_col}_cum - {size_col}) DIV {int(target_bytes)} "
            "AS BIGINT)"
        ),
    )


def compaction_step(
    pending: DataFrame,
    new_files: DataFrame,
    key_col: str,
    size_col: str,
    target_bytes: int,
    bins_emitted: int = 0,
    flush: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """ONE incremental compaction-maintenance step — the streaming leg
    of :func:`compaction_plan` (micro-batch ingest appends a few files
    per trigger; the maintenance job must emit rewrite work lists
    continuously, not re-plan the whole table).

    ``pending`` is the open tail carried from the previous step (the
    files of the bin still below target), ``new_files`` the current
    micro-batch's inventory rows; both are walked together in
    ``key_col`` order through the SAME prefix-sum DIV arithmetic as
    the batch planner.  Every bin except the highest is CLOSED —
    returned in the work list with a globally contiguous id
    (``bins_emitted`` + dense index) — and the highest bin's files
    become the next step's pending (it may still receive files).
    ``flush=True`` closes the tail too (end-of-stream / forced
    OPTIMIZE).

    Semantics note: each emission epoch restarts the prefix at 0, so
    a closed bin always holds ≥ target bytes unless an oversized file
    jumped a boundary (the batch planner's own tail-space rule); the
    packing is first-fit-identical to the batch plan whenever bins
    align with trigger boundaries, and never worse in bin count.

    Returns ``(closed_bins, new_pending)`` — closed_bins has the
    compaction_plan schema, new_pending the input file schema.

    Scale notes: inventories are metadata (≤ a few rows per trigger +
    the open tail); the only full pass is over pending ∪ batch, the
    bin split is a 1-row max cross, and the contiguous renumbering of
    closed bins runs the distributed prefix decomposition
    (operators/prefix.py) over the closed-bin ROLLUP — no
    single-partition window even when a batch replay closes a whole
    table's worth of bins at once."""
    closed, _files, new_pending = compaction_step_detail(
        pending,
        new_files,
        key_col,
        size_col,
        target_bytes,
        bins_emitted=bins_emitted,
        flush=flush,
    )
    return closed, new_pending


def compaction_step_detail(
    pending: DataFrame,
    new_files: DataFrame,
    key_col: str,
    size_col: str,
    target_bytes: int,
    bins_emitted: int = 0,
    flush: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`compaction_step` plus the per-FILE global-bin assignment
    — ``(closed_bins, closed_files, new_pending)`` where
    ``closed_files`` carries every closed input file's columns plus its
    globally-renumbered ``bin``.  The rewrite executor and the
    lifecycle advisor need the file→bin map (which small files merge
    into which compacted file), not just the per-bin work list; both
    views come from ONE binning pass so they cannot drift.

    Scale notes: identical to compaction_step, plus one metadata-scale
    join of the closed files against the (local bin → global bin)
    renumber map — bounded by the bins closed this cycle."""
    inv = new_files if pending is None else pending.unionByName(new_files)
    # metadata-scale lazy pins (r12, guide §2.4): the three returned
    # views — closed bins, closed files, new pending — all hang off the
    # same binning pass, and the bin split + renumber each read their
    # parent twice; without the pins every consumer replays the whole
    # prefix-sum decomposition (the lifecycle composition evaluated the
    # epoch-2 chain 4×, ~100 Exchange nodes in its final plan)
    binned = (
        _binned_files(inv, key_col, size_col, target_bytes)
        .select(*inv.columns, "bin")
        .localCheckpoint(eager=False)
    )
    if flush:
        closed_files = binned
        new_pending = binned.select(*inv.columns).limit(0)
    else:
        top = binned.agg(F.max("bin").alias("_open_bin"))
        with_top = binned.crossJoin(F.broadcast(top))
        closed_files = with_top.where(F.col("bin") < F.col("_open_bin")).select(
            *inv.columns, "bin"
        ).localCheckpoint(eager=False)
        new_pending = with_top.where(
            F.col("bin") == F.col("_open_bin")
        ).select(*inv.columns)
    rolled = closed_files.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(size_col).cast("long").alias("total_bytes"),
        F.min(key_col).alias("first_key"),
        F.max(key_col).alias("last_key"),
    )
    # global ids stay contiguous across epochs even when an oversized
    # file skips local bin numbers; bins are unique, so the exact
    # distributed row number in bin order IS the dense index
    # (pinned: both the work list and the file→bin map read it)
    renum = with_global_prefix(
        rolled, [F.col("bin")], rn_col="_bin_rn"
    ).localCheckpoint(eager=False)
    closed = renum.select(
        (F.col("_bin_rn") - 1 + F.lit(int(bins_emitted)))
        .cast("long")
        .alias("bin"),
        "n_files",
        "total_bytes",
        "first_key",
        "last_key",
    )
    binmap = renum.select(
        F.col("bin").alias("_lbin"),
        (F.col("_bin_rn") - 1 + F.lit(int(bins_emitted)))
        .cast("long")
        .alias("_gbin"),
    )
    files_out = (
        closed_files.join(binmap, closed_files["bin"] == binmap["_lbin"])
        .drop("bin", "_lbin")
        .withColumnRenamed("_gbin", "bin")
    )
    return closed, files_out, new_pending


# --------------------------------------------------------------------------
# Hilbert curve: the locality-better alternative to the Morton interleave.
# Same portability rule as zvalue_sql: pure div/mod/multiply/CASE, no bit
# intrinsics, so the IDENTICAL construction (modulo the integer-division
# token) runs on Spark and DuckDB, and a pure-Python twin pins both.
# --------------------------------------------------------------------------


def hilbert_index(n: int, x: int, y: int) -> int:
    """Pure-Python Hilbert xy→d (the canonical flip-on-(n−1) variant):
    the test reference both engine forms must match, self-verified by
    the adjacency property (consecutive d ⇒ Manhattan-adjacent cells)
    in tests/test_hilbert_layout.py."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x // s) % 2 else 0
        ry = 1 if (y // s) % 2 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _hilbert_round_exprs(
    s: int, n: int, px: str, py: str, pd: str, div: str
) -> tuple[str, str, str]:
    """(new_x, new_y, new_d) SQL for one Hilbert round at block size
    ``s``: quadrant index (3·rx)⊕ry spelled as a CASE (no xor
    intrinsic), then the conditional flip+swap rotation."""
    rx = f"(({px}) {div} {s}) % 2"
    ry = f"(({py}) {div} {s}) % 2"
    quad = (
        f"CASE WHEN {rx} = 1 THEN CASE WHEN {ry} = 1 THEN 2 ELSE 3 END "
        f"ELSE CASE WHEN {ry} = 1 THEN 1 ELSE 0 END END"
    )
    new_d = f"({pd}) + {s * s} * ({quad})"
    new_x = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - ({py}) ELSE ({py}) END) "
        f"ELSE ({px}) END"
    )
    new_y = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - ({px}) ELSE ({px}) END) "
        f"ELSE ({py}) END"
    )
    return new_x, new_y, new_d


def hilbert_lookup(spark, bits: int = 8) -> DataFrame:
    """The (x, y) → hv Hilbert lookup table for a 2^bits grid —
    4^bits rows, a CONSTANT independent of any fact size, built by
    one vectorized numpy pass over ``range(4^bits)``.

    Why a table and not a per-row expression: the rounds are mutually
    recursive in (x, y), so Catalyst's projection collapse inlines
    each round into the next and the fused expression grows ~5× per
    round (≈5^bits nodes — measured 5 s/query at sf0.1 for bits=8).
    Facts then pay ONE broadcast hash join — the classic
    dimension-table discretization of an expensive pure function.

    Why ``mapInPandas`` and not the previous round-per-checkpoint SQL
    ladder (r12, guide §4.2): the ladder cost ``bits`` sequential
    checkpoint-materialization jobs over the domain frame PER CALLING
    QUERY (~2-3 s of the lifecycle/pruning advisors' wall time); the
    numpy form is the identical flip-on-(n−1) rotate-and-flip rounds
    (pure int64 div/mod/xor — bit-identical to ``hilbert_index`` and
    the SQL/DuckDB ladder, pinned by tests/test_hilbert_layout.py) in
    one job with no shuffle."""
    n = 1 << bits

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            x = ids % n
            y = ids // n
            hx, hy = x.copy(), y.copy()
            d = np.zeros_like(ids)
            s = n // 2
            while s > 0:
                rx = (hx // s) % 2
                ry = (hy // s) % 2
                d += s * s * ((3 * rx) ^ ry)
                # rotate: if ry==0 → (flip on rx==1, then swap x/y)
                nx = np.where(rx == 1, n - 1 - hy, hy)
                ny = np.where(rx == 1, n - 1 - hx, hx)
                keep = ry != 0
                hx = np.where(keep, hx, nx)
                hy = np.where(keep, hy, ny)
                s //= 2
            yield pd.DataFrame({"x": x, "y": y, "hv": d})

    return spark.range(0, n * n).mapInPandas(gen, "x long, y long, hv long")


def with_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    out: str = "hv",
    bits: int = 8,
) -> DataFrame:
    """Add ``out`` = Hilbert index of (``x_col``, ``y_col``) — inputs
    must already be folded into [0, 2^bits).  Implemented as a
    broadcast hash join against the 4^bits-row ``hilbert_lookup``
    table (see its docstring for why the per-row expression form is a
    trap); no shuffle on the fact side, no UDF.

    The join is LEFT OUTER so a precondition violation (NULL or
    out-of-range coordinate) surfaces as a NULL ``out`` downstream —
    never as silently dropped rows; a write path ordering on ``out``
    keeps the row (NULLs sort together), and an advisor dividing by
    row counts stays honest."""
    lk = hilbert_lookup(df.sparkSession, bits).select(
        F.col("x").alias("_lx"),
        F.col("y").alias("_ly"),
        F.col("hv").alias(out),
    )
    return df.join(
        F.broadcast(lk),
        (F.col(x_col).cast("long") == F.col("_lx"))
        & (F.col(y_col).cast("long") == F.col("_ly")),
        "left",
    ).drop("_lx", "_ly")


def hilbert_ctes(
    source: str, bits: int = 8, prefix: str = "hb"
) -> tuple[list[str], str]:
    """DuckDB mirror of ``with_hilbert``: CTE chain unrolling the
    rounds (``source`` must yield pass-through columns plus hx, hy;
    the final CTE exposes everything plus ``hv``).  Returns (ctes,
    final_cte_name)."""
    n = 1 << bits
    ctes = [
        f"{prefix}0 AS (SELECT *, CAST(0 AS BIGINT) AS hd0 FROM ({source}))"
    ]
    px, py, pd = "hx", "hy", "hd0"
    step = 0
    for j in range(bits - 1, -1, -1):
        s = 1 << j
        step += 1
        ex, ey, ed = _hilbert_round_exprs(s, n, px, py, pd, "//")
        ctes.append(
            f"{prefix}{step} AS (SELECT * EXCLUDE ({px}, {py}, {pd}), "
            f"{ex} AS hx{step}, {ey} AS hy{step}, {ed} AS hd{step} "
            f"FROM {prefix}{step - 1})"
        )
        px, py, pd = f"hx{step}", f"hy{step}", f"hd{step}"
    ctes.append(
        f"{prefix}f AS (SELECT *, CAST({pd} AS BIGINT) AS hv "
        f"FROM {prefix}{step})"
    )
    return ctes, f"{prefix}f"
