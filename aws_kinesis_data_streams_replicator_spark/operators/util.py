"""Operator-level partitioning utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-partitioned.

    Small single-file tables (the 500-row documents/embeddings fixtures,
    or any dimension snapshot) arrive as 1 scan partition, which would
    serialize compute-heavy per-row operators (md5 shingling, vector
    math, pandas UDFs) onto one core.  At 100 TB inputs already carry
    thousands of partitions and this is a no-op — the guard keeps the
    full shuffle from ever firing on big data.
    """
    if df.isStreaming:
        # partitioning of an unbounded source is the trigger's concern;
        # the probes below (inputFiles / rdd) are batch-only APIs anyway
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # Cheap metadata probe: a scan over >= target files always yields
        # >= target partitions, so the big-data path never pays the
        # plan->RDD conversion below (it materializes the physical plan
        # on the driver - wasted work per invocation on a hot helper).
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass  # non-file relation - fall through to the exact check
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def file_stats(scan: DataFrame) -> DataFrame:
    """Per-file row counts + size from the scan's ``_metadata`` column —
    the layout diagnostic behind compaction decisions (a 100 TB table of
    1 MB files spends more time opening footers than reading data).
    One map-side-combined aggregation; no data columns are read when the
    source supports metadata-only projection."""
    from pyspark.sql import functions as F

    return (
        scan.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("file_path", "file_size")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def layout_report(scan: DataFrame, target_bytes: int = 128 * 1024 * 1024):
    """1-row summary of file layout health: file count, row totals,
    min/max rows per file, and how many files are under half the target
    size (the compaction backlog)."""
    from pyspark.sql import functions as F

    return file_stats(scan).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("total_rows"),
        F.min("n_rows").alias("min_file_rows"),
        F.max("n_rows").alias("max_file_rows"),
        F.sum(
            F.when(F.col("file_size") < target_bytes // 2, 1).otherwise(0)
        ).alias("n_small_files"),
    )


def salted_aggregate(
    df,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
    salt_source: str | None = None,
):
    """Skew-safe two-stage aggregation.

    A single hot key sends all its rows to one reducer; salting splits
    each key into ``n_salt`` sub-keys for a first partial aggregation,
    then merges the partials in a second (tiny) aggregation.  ``aggs``
    maps output name → (function, column) where function ∈
    {sum, count, min, max} — the decomposable aggregates whose partials
    merge losslessly (count merges via sum).

    At 100 TB this is the fallback when AQE skew handling isn't enough
    (e.g. one stream name carrying 50% of traffic in the checkpoint agg).

    Salt is DETERMINISTIC (r12, guide §2.5 / SPARK-38388):
    ``xxhash64(salt_source) pmod n_salt`` when a high-cardinality column
    is named, else xxhash64 over every input column — ``rand(seed)``
    depends on partition + row order, so a fetch-failure retry could
    re-salt rows differently and double-count partials.  The final merge
    is salt-independent, so the RESULT is identical either way; only the
    retry behavior changes.
    """
    from pyspark.sql import functions as F

    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salt_cols = (
        [F.col(salt_source)]
        if salt_source is not None
        else [F.col(c) for c in df.columns]
    )
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salt)).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[first_fn[fn](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    fact,
    dim,
    key: str,
    n_salt: int = 16,
    salt_source: str | None = None,
    force_shuffle: bool = False,
):
    """Skew-safe equi-join: the FACT side's hot keys are split across
    ``n_salt`` sub-partitions by a deterministic salt, and the DIM side
    is replicated once per salt value — so one hot join key spreads over
    ``n_salt`` reducers instead of melting one.

    The manual fallback when AQE's skew-join split can't apply (the
    skewed exchange feeds a downstream stateful op, or the join is
    inside a streaming foreachBatch where AQE re-planning is off).
    Salt is ``xxhash64(salt_source) pmod n_salt`` — deterministic, so
    retried tasks land rows identically (F.rand would break replay
    idempotency); pass a high-cardinality fact column (an id) as
    ``salt_source``, defaulting to the join key itself, which still
    fixes *reducer* skew caused by key collisions in hash partitioning
    (several large keys hashing together) though not a single giant key.

    Cost: dim is materialized ``n_salt``× into the shuffle — use only
    when dim ≪ fact (but too big or too state-entangled to broadcast).
    Result is exactly ``fact JOIN dim USING (key)``.

    ``force_shuffle`` pins the ``shuffle_hash`` strategy on the dim
    side: at fixture scale a small dim would broadcast and the salted
    (key, salt) shuffle would never materialize — the flag makes the
    demonstrated plan the plan used at 100 TB, where salting only
    matters once both sides must shuffle (r12: the
    join_salted_skew_rollup registered query).
    """
    from pyspark.sql import functions as F

    src = salt_source or key
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salt)).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    if force_shuffle:
        exploded_dim = exploded_dim.hint("shuffle_hash")
    return salted_fact.join(exploded_dim, [key, "_salt"]).drop("_salt")
