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
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
