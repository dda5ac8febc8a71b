"""The reference's two golden unit assertions, ported (SURVEY §5).

* HandlerTest.testExtractStreamName (HandlerTest.java:42-46)
* HandlerTest.testJsonParsing       (HandlerTest.java:36-39)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.functions.arn import stream_name_from_arn
from aws_kinesis_data_streams_replicator_spark.functions.json_payload import (
    decode_payload,
    extract_commit_timestamp,
    parse_cdc_payload,
)

GOLDEN_ARN = (
    "arn:aws:kinesis:us-east-1:1000000000:stream/kds-stream-1"
    "/consumer/kds-replicator:843564834"
)
GOLDEN_PAYLOAD = '{"key": 2049761200, "commitTimestamp": "2021-10-12T19:16:14Z"}'


def test_extract_stream_name(spark):
    df = spark.sql(f"SELECT '{GOLDEN_ARN}' AS arn")
    assert df.select(stream_name_from_arn(F.col("arn")).alias("s")).first().s == "kds-stream-1"


def test_json_commit_timestamp(spark):
    df = spark.sql(f"SELECT '{GOLDEN_PAYLOAD}' AS payload")
    row = df.select(
        extract_commit_timestamp(F.col("payload")).alias("ts"),
        parse_cdc_payload(F.col("payload")).alias("cdc"),
    ).first()
    assert row.ts == "2021-10-12T19:16:14Z"
    assert row.cdc.key == 2049761200
    assert row.cdc.commitTimestamp == "2021-10-12T19:16:14Z"


def test_json_schema_on_read_extra_fields(spark):
    """Extra/unknown fields are tolerated (Handler.java uses a pointer probe)."""
    payload = '{"key": 1, "commitTimestamp": "2021-01-01T00:00:00Z", "unknown": {"deep": [1,2]}}'
    df = spark.sql(f"SELECT '{payload}' AS payload")
    assert (
        df.select(extract_commit_timestamp(F.col("payload")).alias("ts")).first().ts
        == "2021-01-01T00:00:00Z"
    )


def test_payload_utf8_roundtrip(spark):
    """Byte-faithful passthrough: decode(encode(s)) == s (Handler.java:74,82)."""
    df = spark.sql("SELECT encode('{\"key\": 1}', 'UTF-8') AS data")
    assert df.select(decode_payload(F.col("data")).alias("p")).first().p == '{"key": 1}'
