"""Payload decode + JSON scalar extraction (reference ops 3 & 4).

* ``Handler.java:74`` decodes the Kinesis payload bytes as UTF-8;
* ``Handler.java:86`` probes ``/commitTimestamp`` with a Jackson JSON
  pointer — schema-on-read, extra fields ignored, value kept as STRING.

Spark mapping: ``decode(data,'UTF-8')`` + ``get_json_object`` for the
single-field probe (no full parse), or ``from_json`` with CDC_SCHEMA when
full typing is wanted.  Both stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Typed view of the CDC record (README.md:11-16); extra fields tolerated.
CDC_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("commitTimestamp", StringType()),
    ]
)


def decode_payload(data: Column) -> Column:
    """bytes → UTF-8 string (Handler.java:74). Forward `data` itself to
    sinks — never re-serialize parsed JSON (byte-faithful passthrough,
    Handler.java:82)."""
    return F.decode(data, "UTF-8")


def extract_commit_timestamp(payload: Column) -> Column:
    """Single-field JSON-pointer probe (Handler.java:86): stays a string."""
    return F.get_json_object(payload, "$.commitTimestamp")


def parse_cdc_payload(payload: Column) -> Column:
    """Full typed parse — the `from_json` alternative (SURVEY §2 op 4)."""
    return F.from_json(payload, CDC_SCHEMA)
