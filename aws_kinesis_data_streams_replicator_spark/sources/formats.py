"""Alternate envelope wire formats: JSON-lines, CSV, and ORC.

The reference only ever sees Kinesis events, but an engine replacing it
ingests staged batches from whatever lands in object storage.  The text
formats carry the binary ``data`` payload base64-encoded (neither is
binary-safe) and decode back to EXACT bytes via ``unbase64`` —
preserving the byte-faithful passthrough contract (Handler.java:74,82).
ORC is binary-safe and columnar, so the envelope round-trips natively
(no base64 leg) — the columnar alternative when a lake standardizes on
ORC instead of parquet.

Schema is always enforced explicitly — schema inference on JSON/CSV is
a full extra pass over the data at 100 TB and can mis-type columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WIRE_SCHEMA = (
    "eventSourceARN string, partitionKey string, sequenceNumber string, "
    "approximateArrivalTimestamp timestamp, data_b64 string"
)


def _to_wire(envelope: DataFrame) -> DataFrame:
    # Spark's base64() emits MIME-wrapped output (newline every 76 chars);
    # embedded newlines would force multiLine CSV parsing, which makes
    # files unsplittable at scale — strip to canonical single-line base64.
    b64 = F.regexp_replace(F.base64(F.col("data")), "[\r\n]", "")
    return envelope.select(
        "eventSourceARN",
        "partitionKey",
        "sequenceNumber",
        "approximateArrivalTimestamp",
        b64.alias("data_b64"),
    )


def _from_wire(wire: DataFrame) -> DataFrame:
    return wire.select(
        "eventSourceARN",
        "partitionKey",
        "sequenceNumber",
        "approximateArrivalTimestamp",
        F.unbase64(F.col("data_b64")).alias("data"),
    )


def write_envelope_json(envelope: DataFrame, path: str) -> None:
    _to_wire(envelope).write.mode("overwrite").json(path)


def read_envelope_json(spark: SparkSession, path: str) -> DataFrame:
    return _from_wire(spark.read.schema(WIRE_SCHEMA).json(path))


def write_envelope_csv(envelope: DataFrame, path: str) -> None:
    _to_wire(envelope).write.mode("overwrite").option("header", True).csv(path)


def read_envelope_csv(spark: SparkSession, path: str) -> DataFrame:
    return _from_wire(
        spark.read.schema(WIRE_SCHEMA).option("header", True).csv(path)
    )


def write_envelope_orc(envelope: DataFrame, path: str) -> None:
    # ORC is binary-safe: the envelope (including the binary payload)
    # round-trips natively, no base64 wire projection needed
    envelope.write.mode("overwrite").orc(path)


def read_envelope_orc(spark: SparkSession, path: str) -> DataFrame:
    from .envelope import ENVELOPE_SCHEMA

    return spark.read.schema(ENVELOPE_SCHEMA).orc(path)
