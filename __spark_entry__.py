"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship replication query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry from
``aws_kinesis_data_streams_replicator_spark.plans.queries`` — one entry
per implemented operator (SURVEY.md §2 + LLM-pipeline extensions),
every one with a full DuckDB value oracle (approximate operators emit
tolerance claims as oracle-asserted booleans).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_kinesis_data_streams_replicator_spark.plans.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    flagship,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


_PYFILES_SHIPPED = False


def _ship_package(spark: SparkSession) -> None:
    """Make the engine package importable on executor Python workers.

    Python-UDF/UDTF objects defined at module level are cloudpickled BY
    REFERENCE; if the driver process was started outside this repo, the
    workers cannot import the package and every Python-path query dies
    with ModuleNotFoundError.  Shipping a zip via addPyFile fixes that
    for any driver cwd."""
    global _PYFILES_SHIPPED
    if _PYFILES_SHIPPED:
        return
    try:
        import tempfile
        import zipfile

        root = os.path.dirname(os.path.abspath(__file__))
        pkg = "aws_kinesis_data_streams_replicator_spark"
        zpath = os.path.join(
            tempfile.gettempdir(), f"akr_pkg_{os.getpid()}.zip"
        )
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(os.path.join(root, pkg)):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
        spark.sparkContext.addPyFile(zpath)
        _PYFILES_SHIPPED = True
    except Exception:
        pass  # already-on-path setups (tests) work without it


def _apply_session_conf(spark: SparkSession) -> None:
    """The runtime confs the engine depends on (driver may own the session)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        # a vanilla session defaults to 200 shuffle partitions — pure
        # task-launch overhead at correctness-gate scale; AQE coalescing
        # keeps this right-sized either way
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    _ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _apply_session_conf(spark)
    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return dict(ORACLE_SQL)
