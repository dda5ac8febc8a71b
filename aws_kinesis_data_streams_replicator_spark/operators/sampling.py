"""Deterministic sampling & sequence-packing operators for training-data
pipelines.

Corpus curation needs reproducible subsets: language/domain rebalancing
(downsample the dominant stratum), contamination-free eval splits, and
token-budget packing of documents into training sequences.  Everything
here is a pure map-side column expression — no shuffle for the sample,
one windowed pass for the packing — and every decision is a
deterministic function of the row's content, so re-running the pipeline
(or resuming a failed 100 TB run) selects the identical subset.

Scale notes (100 TB): the hash-threshold sample is embarrassingly
parallel (no shuffle, no state, prunes at the scan when combined with a
stratum partition column).  Packing is a per-stratum prefix sum — one
window shuffle partitioned by stratum; at scale, partition the corpus by
(stratum, shard) so each window partition fits an executor, then pack
within shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hash_rate_threshold(rate: float, digits: int = 4) -> str:
    """Hex-string threshold t such that P(md5_prefix < t) ≈ rate.

    md5 hex chars are uniform, so the first ``digits`` chars compared
    lexicographically against ``format(rate · 16^digits)`` keep ≈rate of
    rows — a pure string compare, bit-identical in Spark and DuckDB (no
    hex→int conversion, which the engines spell differently).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16**digits), 16**digits - 1), f"0{digits}x")


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "text",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample, keyed on content hash.

    Keeps a row iff the first 4 hex chars of md5(key) fall below the
    stratum's threshold — so the sample is a pure filter (no shuffle, no
    RNG state), stable across runs/partitionings, and identical rows
    sample identically (duplicate texts stay together, which exact-dedup
    downstream relies on).
    """
    digits = 4
    thr = F.lit(hash_rate_threshold(default_rate, digits))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(hash_rate_threshold(rate, digits))
        ).otherwise(thr)
    return documents.where(F.substring(F.md5(F.col(key_col)), 1, digits) < thr)


def balanced_sample(
    documents: DataFrame,
    stratum_col: str = "lang",
    key_col: str = "text",
) -> DataFrame:
    """Downsample every stratum to ≈ the minority stratum's size — the
    domain-rebalancing step of corpus mixing, fully deterministic.

    Per-stratum rate = min_count / stratum_count, applied via the same
    md5-prefix threshold as ``stratified_sample`` but with the threshold
    DERIVED IN-PLAN from the stratum counts (integer floor arithmetic +
    %04x formatting, identical in the DuckDB oracle): no driver-side
    collect, so the plan composes into pipelines.  The count aggregate is
    tiny (|strata| rows) and broadcasts back onto the scan.
    """
    cnt = documents.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    m = cnt.agg(F.min("_n").alias("_m"))
    thr = cnt.crossJoin(F.broadcast(m)).select(
        stratum_col,
        F.format_string(
            "%04x",
            # exact integer floor division — a truncated double quotient
            # could round across an integer boundary and diverge from the
            # oracle's `//`
            F.least(F.lit(65535).cast("long"), F.expr("(_m * 65536) div _n")),
        ).alias("_thr"),
    )
    return documents.join(F.broadcast(thr), stratum_col).where(
        F.substring(F.md5(F.col(key_col)), 1, 4) < F.col("_thr")
    )


def bottom_k_sample(
    df: DataFrame,
    k: int,
    key_col: str = "text",
    stratum_col: str | None = None,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-size uniform sample: keep the k smallest
    content hashes (the distributed equivalent of a reservoir sample —
    same marginal distribution, but reproducible and mergeable).

    ``tiebreak_col`` (a unique id) breaks hash ties: without it the
    rank under DUPLICATE ``key_col`` values is engine/partitioning
    order — invisible on unique-content fixtures, caught by the skew
    fixture's mass-duplicated documents in r9.

    Per-stratum: one window shuffle on the stratum key.  Global: sort +
    limit compiles to ``TakeOrderedAndProject`` — per-partition top-k
    then a driver merge of k·partitions rows, never a full sort — and
    the rank window runs over just k rows.
    """
    h = F.md5(F.col(key_col)).alias("_h")
    order = ["_h", tiebreak_col]
    if stratum_col is not None:
        w = Window.partitionBy(stratum_col).orderBy(*order)
        return (
            df.select("*", h)
            .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
            .where(F.col("sample_rank") <= k)
            .drop("_h")
        )
    topk = df.select("*", h).orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        topk.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )


def weighted_priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "text",
) -> DataFrame:
    """Deterministic weighted sample without replacement: priority =
    hash₆₀(key) div weight, keep the k smallest priorities — heavier
    rows draw proportionally smaller priorities (the integer-exact
    analogue of A-ES exponential-jump sampling; ``u^(1/w)`` keys need
    doubles, which the oracle gate can't hash).

    Pure map-side priority + ``TakeOrderedAndProject`` — no shuffle of
    the full table at any scale.
    """
    # integer floor-div (DIV) so Spark and the oracle agree exactly
    pri = F.expr(
        f"CAST(conv(substring(md5({key_col}), 1, 15), 16, 10) AS BIGINT) "
        f"DIV greatest(1L, CAST({weight_col} AS BIGINT))"
    )
    topk = df.withColumn("priority", pri).orderBy("priority", key_col).limit(k)
    w = Window.orderBy("priority", key_col)
    return topk.withColumn(
        "sample_rank", F.row_number().over(w).cast("bigint")
    )


def pack_sequences(
    documents: DataFrame,
    token_budget: int = 2048,
    stratum_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into fixed token-budget training bins, greedily in
    ``order_col`` order within each stratum.

    bin_id = (tokens before this doc) div budget — the contiguous-fill
    rule: a document opens a new bin when the running total crosses the
    budget.  One integer window pass; every assignment is a deterministic
    function of (stratum, order), so packing is reproducible and
    restartable.  Returns per-bin accounting (docs, tokens, fill span).
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = documents.select(
        stratum_col,
        order_col,
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    )
    packed = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    ).withColumn("bin_id", F.expr(f"cum_before div {int(token_budget)}"))
    return packed.groupBy(stratum_col, "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )


def mixture_weights(
    documents: DataFrame, stratum_cols: tuple[str, ...] = ("lang", "source")
) -> DataFrame:
    """Per-stratum resampling weights (ppm) for a uniform target mixture —
    the "how much do I up/down-sample each domain" table that drives
    data-mixing for a training run.

    weight_ppm = (total_docs · 10⁶) div (n_strata · n_docs): strata above
    their uniform share get weight < 10⁶ (downsample), rare strata get
    weight > 10⁶ (upsample / repeat-epochs).  Integer-exact.

    Scale notes (100 TB): one map-side-combined aggregation down to
    |strata| rows (domains × languages — thousands at most), then an
    unpartitioned window over that tiny table only; the raw corpus is
    never windowed.  The output joins back to the corpus broadcast.
    """
    g = documents.groupBy(*stratum_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy()
    return g.select(
        *stratum_cols,
        "n_docs",
        F.sum("n_docs").over(w).cast("long").alias("total_docs"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_strata"),
    ).select(
        *stratum_cols,
        "n_docs",
        "total_docs",
        "n_strata",
        F.expr("(total_docs * 1000000) DIV (n_strata * n_docs)").alias("weight_ppm"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Per-group document cap: keep the top ``cap`` rows per group by
    (``order_col`` DESC, ``id_col`` ASC) — the per-domain cap every
    web-corpus pipeline applies so one mega-site cannot dominate the
    training mixture (C4/RefinedWeb-style host capping).

    Deterministic: the tiebreak on ``id_col`` makes row_number stable
    across retries and engines.

    Scale notes (100 TB): one hash shuffle on ``group_col`` + a windowed
    rank with an early ``<= cap`` filter — rank windows stream (no full
    buffering: WindowExec only holds a frame's rows, here 1).  A single
    pathological group (one domain = 10% of the web) makes one hot
    partition; the standard mitigation is a two-stage cap — pre-cap per
    (group, salt) at ``cap`` then re-cap per group — which multiplies
    the shuffle by a small constant and bounds any partition at
    salt·cap rows; at fixture scale the single-stage plan is the right
    one, and the two-stage variant is the same two lines repeated.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("group_rank", F.row_number().over(w).cast("long"))
        .where(F.col("group_rank") <= F.lit(cap))
    )
