"""Custom Python DataSource: deterministic Kinesis-load generator.

The reference's validation procedure drives load with the Kinesis Data
Generator using the payload template (README.md:120-125):

    {"key": {{random.number(10000000000)}},
     "commitTimestamp": "{{date.utc}}"}

This DataSource (Spark 4 Python DataSource API) is that generator as a
first-class source: ``spark.read.format("kds_generator")`` for batch and
``spark.readStream`` via ``SimpleDataSourceStreamReader`` for
micro-batched streaming — the connector-shaped stand-in for a real
Kinesis DSv2 source, with exactly the envelope schema the engine's
pipeline consumes.

Everything is seed-deterministic (md5-derived keys, monotone commit
timestamps per stream — the CDC premise README.md:9), so tests can
assert exact outputs and streaming restarts resume mid-sequence from the
WAL offset.

Scale notes: batch reads split into ``numPartitions`` independent index
ranges — generation is embarrassingly parallel and shuffle-free.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .envelope import ARN_PREFIX, ARN_SUFFIX

ENVELOPE_DDL = (
    "eventSourceARN string, partitionKey string, sequenceNumber string, "
    "approximateArrivalTimestamp timestamp, data binary"
)

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)
_STREAM_NAMES = ("kds-click", "kds-view", "kds-purchase", "kds-signup", "kds-error")


def _record(i: int, seed: int, n_streams: int) -> tuple:
    """Deterministic envelope record #i (pure function of (i, seed))."""
    h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
    stream = _STREAM_NAMES[int(h[:4], 16) % n_streams]
    key = int(h[4:14], 16) % 10_000_000_000  # random.number(1e10)
    ts = _BASE_TS + timedelta(seconds=i)  # monotone per stream (CDC premise)
    commit = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    payload = json.dumps({"key": key, "commitTimestamp": commit}).encode()
    return (
        f"{ARN_PREFIX}{stream}{ARN_SUFFIX}",
        str(key % 1000),
        f"{i:020d}",
        ts.replace(tzinfo=None),
        payload,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _GenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_streams = int(options.get("streams", 5))
        self.n_parts = int(options.get("numPartitions", 8))

    def partitions(self):
        per = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _record(i, self.seed, self.n_streams)


class _GenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.n_streams = int(options.get("streams", 5))
        self.batch_rows = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.max_rows)
        rows = [_record(i, self.seed, self.n_streams) for i in range(lo, hi)]
        return iter(rows), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # WAL replay after failure: regenerate the exact same range
        return iter(
            _record(i, self.seed, self.n_streams)
            for i in range(start["i"], end["i"])
        )


class KdsGeneratorDataSource(DataSource):
    """``format("kds_generator")`` — options: rows, seed, streams,
    numPartitions (batch); rowsPerBatch, maxRows (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "kds_generator"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema):
        return _GenBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _GenStreamReader(self.options)


def register(spark) -> None:
    """Register the source, pickling this module BY VALUE: the streaming
    Python-source planner runs in its own Python process that sees
    neither the driver's sys.path nor sc.addPyFile files, so a
    by-reference pickle dies with ModuleNotFoundError there."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(KdsGeneratorDataSource)
