"""SparkSession factory.

The reference builds its AWS clients once per warm Lambda container and
reuses them across invocations (Handler.java:46-57); the Spark analog is a
single long-lived SparkSession, created here with the settings every part
of the engine relies on:

* AQE on (runtime coalescing / skew-join handling — our stand-in for the
  reference's hand-rolled batching heuristics),
* UTC session timezone (the reference treats all timestamps as ISO-8601
  UTC strings, Handler.java:86),
* Arrow execution for the few pandas-UDF operators,
* ``spark.sql.legacy.parquet.nanosAsLong`` because the driver-generated
  ``events`` table stores TIMESTAMP(NANOS), which Spark 4 otherwise
  rejects; ``sources.tables`` converts the raw nanos back to a timestamp.

Scale notes (100 TB): everything here is also what you'd set on a real
cluster, except ``master``/memory sizing which would come from the
cluster manager.  Shuffle partitions default from ``SPARK_GRAFT_CPUS``
locally; at cluster scale you'd size them to ~128 MB per shuffle block or
rely on AQE coalescing from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aws-kinesis-data-streams-replicator-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Reuses an existing active session when present — the driver may hand
    us one — but still applies runtime-settable confs so behavior is
    consistent either way.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "*"))
    n_shuffle = int(
        shuffle_partitions
        or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", 0)
        or (32 if cpus in ("*", "") else max(int(cpus), 8))
    )

    runtime_conf = {
        # Correctness-critical: ISO-8601 UTC end-to-end (Handler.java:86).
        "spark.sql.session.timeZone": "UTC",
        # The events fixture is TIMESTAMP(NANOS); read as long, convert in loader.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Dim tables (region/nation/supplier/config) are tiny at any SF —
        # make sure they broadcast rather than shuffle the fact side.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.parquet.compression.codec": "snappy",
    }
    if extra_conf:
        runtime_conf.update(extra_conf)

    active = SparkSession.getActiveSession()
    if active is not None:
        for k, v in runtime_conf.items():
            try:
                active.conf.set(k, v)
            except Exception:
                pass  # static conf on a running session — keep going
        return active

    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in runtime_conf.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    # bucketed-table storage (co-located joins); keep out of the repo tree
    builder = builder.config(
        "spark.sql.warehouse.dir",
        os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/akr-warehouse"),
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
