#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query executes fully via a noop-format write (no driver collect, no
sink I/O in the measurement).  A tiny warmup query absorbs JVM/codegen
startup so numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES
from aws_kinesis_data_streams_replicator_spark.session import get_spark


def run_query(fn, spark, sf_dir: str, warmup: bool = True) -> float:
    """Steady-state timing: one untimed run absorbs per-query codegen
    compilation + parquet footer caching, then one timed run."""
    if warmup:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("akr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches
    spark.sql("SELECT count(*) FROM range(1000000)").collect()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        try:
            timings[name] = round(run_query(QUERIES[name], spark, sf_dir), 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_seconds_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
