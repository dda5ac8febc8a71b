"""Temporal joins the reference lacks (SURVEY §2.2): as-of and bounded
range joins, built shuffle-lean.

* ``as_of_join`` — "most recent right row at or before each left row".
  NOT implemented as an inequality join (which Spark would execute as a
  broadcast-nested-loop / cartesian): both sides are unioned and a
  single ``last(..., ignorenulls)`` window pass picks the prior right
  row.  One shuffle on the partition key, O(n log n) per key, no pair
  explosion — the classic scalable formulation.

* ``range_count_join`` — "count right rows within a bounded time range
  of each left row".  Implemented as a *bucketed* equi-join: right rows
  are exploded to (bucket, bucket+1) with bucket width == range width,
  so each left row equi-joins exactly the two buckets that can contain
  matches, then the precise range predicate filters.  Shuffle is keyed
  on (partition key, bucket) — no theta-join, skew bounded by bucket
  population.

Scale notes (100 TB): both plans shuffle once by (key[, bucket]) and
stream within partitions; neither materializes a cross product.  For
as-of with a very hot key, pre-salt the union by hashing the right side
into the same salt buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right_ts <= left_ts`` (per ``on`` key); NULLs when none exists.

    Equal timestamps match (right sorts before left at the same instant).
    ``tie_break`` orders concurrent right rows deterministically.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
        (F.lit(None).cast(right.schema[tie_break].dataType) if tie_break else F.lit(None)).alias("_tb"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        (F.col(tie_break) if tie_break else F.lit(None)).alias("_tb"),
    ).select(*l.columns)  # align column order for union
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *u.columns,
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_payload
        ],
    )
    return filled.where(F.col("_side") == 1).select(
        *lcols, *[F.col(f"asof_{c}") for c in right_payload]
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    range_micros: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row: count of right rows with
    ``left_ts - range <= right_ts < left_ts`` (same ``on`` key).

    Bucket width == range width ⇒ every candidate right row lives in the
    left row's bucket or the one before it; exploding the right side to
    (bucket, bucket+1) turns the theta-join into an equi-join.
    """
    lb = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(range_micros)).cast("long")
    rb = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(range_micros)).cast("long")
    l = left.withColumn("_bucket", lb).withColumn("_lus", F.unix_micros(F.col(left_ts)))
    r = (
        right.select(
            F.col(on).alias("_ron"),
            F.unix_micros(F.col(right_ts)).alias("_rus"),
            F.explode(F.array(rb, rb + 1)).alias("_bucket"),
        )
    )
    matched = (
        l.join(
            r,
            (F.col(on) == F.col("_ron"))
            & (l["_bucket"] == r["_bucket"])
            & (F.col("_rus") < F.col("_lus"))
            & (F.col("_rus") >= F.col("_lus") - F.lit(range_micros)),
            "left",
        )
        .groupBy(*[l[c] for c in left.columns])
        .agg(F.count(F.col("_rus")).alias(count_alias))
    )
    return matched


def grid_distance_join(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_cell_size: int | None = None,
) -> DataFrame:
    """All pairs of points within ``radius`` (non-negative integer
    coordinates, exact squared-distance verify): (id_a, id_b, dist_sq)
    with id_a < id_b.

    The spatial join, bucketed the same way LSH buckets similarity
    (operators/dedup.py): the plane is tiled into radius-sized cells, so
    any pair within ``radius`` lands in the same or an adjacent cell.
    The LEFT side explodes into its 3x3 cell neighborhood (a bounded
    x9, not xN, blowup) and equi-joins the RIGHT side's home cell --
    candidate count is per-cell density work, never N^2.  The exact
    integer dist^2 filter removes false positives; no pair is missed
    (cell size = radius => the neighborhood covers the disk) and none
    duplicates (the right side's home cell is a single key, and
    id_a < id_b keeps one orientation).

    Scale notes (100 TB): one shuffle each side keyed by cell; a dense
    hotspot cell degrades quadratically ONLY within that cell.
    ``max_cell_size`` caps it, keeping at most that many points per cell
    (deterministically, the lowest ids — the same hot-key guard as
    ngram_jaccard_pairs' max_shingle_df): candidate work is then bounded
    by 9·cap² per cell at the cost of possibly missing pairs whose
    endpoint was evicted from a hotspot.  Leave None for exact results."""
    home = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.expr(f"CAST({x_col} AS BIGINT) DIV {radius}").alias("gx"),
        F.expr(f"CAST({y_col} AS BIGINT) DIV {radius}").alias("gy"),
    )
    if max_cell_size is not None:
        w = Window.partitionBy("gx", "gy").orderBy("pid")
        home = (
            home.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= max_cell_size)
            .drop("_rk")
        )
    offsets = ", ".join(
        f"struct({dx}L AS dx, {dy}L AS dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    left = (
        home.select(
            F.col("pid").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.expr(f"explode(array({offsets}))").alias("o"),
            "gx",
            "gy",
        )
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("gx") + F.col("o.dx")).alias("jx"),
            (F.col("gy") + F.col("o.dy")).alias("jy"),
        )
    )
    right = home.select(
        F.col("pid").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("gx").alias("jx"),
        F.col("gy").alias("jy"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["jx", "jy"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist_sq.alias("dist_sq"))
        .where(F.col("dist_sq") <= radius * radius)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval–interval OVERLAP join (``l_start <= r_end AND r_start
    <= l_end``, closed intervals in the same integer unit) as a
    bucketed equi-join — the temporal join behind "which sessions ran
    during which incidents": a raw theta join is a cartesian product,
    so both sides explode to the ``bucket_width``-sized cells their
    interval covers, candidates meet on the cell id, the exact overlap
    predicate filters, and a distinct pass collapses the multi-cell
    matches.

    Returns every (left row, right row) PAIR that overlaps — true theta
    -join bag semantics: duplicate input rows yield duplicate pairs
    (each side is tagged with a per-execution row id before the cell
    explode, and the final distinct collapses only multi-cell matches
    of the SAME input pair, never pairs arising from genuinely
    duplicate rows).  Callers aggregate; column collisions are the
    caller's to alias.

    Scale notes (100 TB): replication factor per row = its interval
    length / bucket_width (pick the width near the TYPICAL interval —
    cells per row stay O(1)); the join is a hash equi-join on the cell
    id, never a cartesian.  A pathological long interval replicates
    proportionally — cap or split such outliers upstream (the
    hot-shingle-DF-cap convention); the exact predicate keeps results
    correct under ANY width choice, width tunes only cost.  Cell ids
    are exact BIGINT floor divisions — ``F.floor(col / w)`` would round
    through a double and mis-cell endpoints beyond 2^53 (nanosecond
    epochs), silently dropping candidate pairs."""
    w = int(bucket_width)

    def _cell(c: str):
        # exact floor division on BIGINTs: subtract the non-negative
        # remainder, then integer-DIV the exactly-divisible numerator
        return F.expr(f"CAST(({c} - ((({c} % {w}) + {w}) % {w})) DIV {w} AS BIGINT)")

    l = (
        left.withColumn("_lrid", F.monotonically_increasing_id())
        .withColumn(
            "_lcell", F.explode(F.sequence(_cell(l_start), _cell(l_end)))
        )
    )
    r = (
        right.withColumn("_rrid", F.monotonically_increasing_id())
        .withColumn(
            "_rcell", F.explode(F.sequence(_cell(r_start), _cell(r_end)))
        )
    )
    joined = l.join(r, l["_lcell"] == r["_rcell"]).where(
        (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    )
    return joined.dropDuplicates(["_lrid", "_rrid"]).drop(
        "_lcell", "_rcell", "_lrid", "_rrid"
    )

