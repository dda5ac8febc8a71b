"""Kinesis record-envelope simulator.

No Kinesis connector ships with OSS Spark, so (SURVEY §7 "hard parts")
the engine treats the envelope as a schema contract and derives test
envelopes deterministically from the driver's ``events`` table.  The
schema mirrors exactly the fields the reference handler reads
(Handler.java:63,72-87; FIXTURES.md §A1):

    eventSourceARN string, partitionKey string, sequenceNumber string,
    approximateArrivalTimestamp timestamp, data binary

Derivation (fixed, so a DuckDB oracle can reproduce it):

* stream name   = ``'kds-' || event_type``       (5 distinct streams)
* ARN           = consumer-ARN shape from the golden test
                  (HandlerTest.java:43)
* partitionKey  = ``user_id`` as string
* sequenceNumber= zero-padded ``event_id`` (lexicographic == numeric)
* arrival ts    = ``ts``
* data          = UTF-8 bytes of the CDC JSON payload (README.md:11-16)
                  ``{"key": <user_id>, "commitTimestamp": "<iso8601 µs>",
                  "props": <props-json>}`` — built by string concat, not
                  ``to_json``, so the byte image is engine-independent.

Scale notes: this is a pure narrow projection over the source — no
shuffle, fully pushed into whole-stage codegen.  With a real Kinesis
DataSource the same downstream plan applies unchanged; shard id would
land in ``partitionKey`` and per-shard ordering in ``sequenceNumber``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("eventSourceARN", StringType()),
        StructField("partitionKey", StringType()),
        StructField("sequenceNumber", StringType()),
        StructField("approximateArrivalTimestamp", TimestampType()),
        StructField("data", BinaryType()),
    ]
)

ARN_PREFIX = "arn:aws:kinesis:us-east-1:100000000000:stream/"
ARN_SUFFIX = "/consumer/kds-replicator:843564834"
COMMIT_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def commit_timestamp_col(ts: Column) -> Column:
    """ISO-8601 UTC string with µs — stored/compared as STRING end-to-end,
    exactly like the reference (Handler.java:86,132)."""
    return F.date_format(ts, COMMIT_TS_FORMAT)


def payload_col(key: Column, ts: Column, props: Column) -> Column:
    """CDC JSON payload as a deterministic byte-for-byte string."""
    return F.concat(
        F.lit('{"key": '),
        key.cast("string"),
        F.lit(', "commitTimestamp": "'),
        commit_timestamp_col(ts),
        F.lit('", "props": '),
        props,
        F.lit("}"),
    )


def envelope_from_events(events: DataFrame, stream_prefix: str = "kds-") -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → envelope rows."""
    stream_name = F.concat(F.lit(stream_prefix), F.col("event_type"))
    return events.select(
        F.concat(F.lit(ARN_PREFIX), stream_name, F.lit(ARN_SUFFIX)).alias("eventSourceARN"),
        F.col("user_id").cast("string").alias("partitionKey"),
        F.lpad(F.col("event_id").cast("string"), 20, "0").alias("sequenceNumber"),
        F.col("ts").alias("approximateArrivalTimestamp"),
        F.encode(
            payload_col(F.col("user_id"), F.col("ts"), F.col("props")), "UTF-8"
        ).alias("data"),
    )
