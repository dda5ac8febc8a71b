"""Time named registered queries with the bench's methodology (noop sink,
best-of-N in one session) — the A/B harness for the optimization rounds.

Usage:  python tools/ab_time.py [-n RUNS] <query> [query ...]

Reads SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).  Prints one
line per query: best seconds over N runs (first run doubles as warmup,
matching bench.py's run_query).
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as _entry
from aws_kinesis_data_streams_replicator_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = _entry.queries()
    spark = get_spark()
    for name in args:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        times = []
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        gc.collect()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name:45s} best {min(times):6.2f}s  "
            f"runs [{', '.join(f'{t:.2f}' for t in times)}]"
        )


if __name__ == "__main__":
    main()
