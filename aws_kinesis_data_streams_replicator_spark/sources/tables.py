"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Timestamp normalization: the driver's parquet has shipped timestamps
both as TIMESTAMP(NANOS) (read, under ``spark.sql.legacy.parquet.
nanosAsLong``, as a raw nanosecond long) and as TIMESTAMP(MICROS)
without timezone (read by Spark 4 as TIMESTAMP_NTZ under the default
``spark.sql.parquet.inferTimestampNTZ.enabled``).  Both are normalized
here to plain TIMESTAMP so every downstream operator sees ONE timestamp
type: ns-longs via integer division (matching DuckDB's ns→µs
truncation), NTZ via a cast that is value-preserving because the engine
pins ``spark.sql.session.timeZone=UTC`` (session.py / __spark_entry__).

Scale notes: at 100 TB each "table" is a directory of many parquet files,
ideally partitioned (events by date, lineitem by ship-date month);
``spark.read.parquet`` handles that transparently and Catalyst prunes
partitions from pushed-down filters.  Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, normalizing types to the FIXTURES.md schema."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long → µs timestamp; integer division (no double rounding).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if ntz:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz}
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view (mirrors the driver's DuckDB views)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
