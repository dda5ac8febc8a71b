#!/usr/bin/env python
"""Per-trigger profile of the streaming replication job.

Runs the SAME staged-envelope workload as bench.py's bench_streaming
(one discarded warmup + N measured runs per delivery mode) and dumps,
for each measured run, the per-trigger StreamingQueryProgress evidence
the r12 VERDICT asked for: numInputRows, durationMs breakdown
(addBatch / triggerExecution / walCommit / ...), and the wall-clock +
records/sec.  Written to the JSON path in argv[1] (default
/tmp/stream_profile.json).

Usage:  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
            python tools/stream_profile.py out.json [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(spark, sf_dir: str, exactly_once: bool) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_kinesis_data_streams_replicator_spark.operators.replication import (
        gate_active_region,
        with_decoded,
    )
    from aws_kinesis_data_streams_replicator_spark.plans.queries import _config_df
    from aws_kinesis_data_streams_replicator_spark.sources.envelope import (
        envelope_from_events,
    )
    from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
    from aws_kinesis_data_streams_replicator_spark.streaming.job import (
        run_replication_stream,
    )
    from aws_kinesis_data_streams_replicator_spark.streaming.source import (
        read_envelope_stream,
        stage_envelope_files,
    )

    work = tempfile.mkdtemp(prefix="akr-profile-stream-")
    try:
        env = envelope_from_events(load_table(spark, sf_dir, "events"))
        copies = F.broadcast(
            spark.range(4).select(F.col("id").cast("string").alias("_copy"))
        )
        env = env.crossJoin(copies).select(
            "eventSourceARN",
            "partitionKey",
            F.concat("_copy", "sequenceNumber").alias("sequenceNumber"),
            "approximateArrivalTimestamp",
            "data",
        )
        stage = os.path.join(work, "stage")
        stage_envelope_files(env, stage, n_files=8)
        cfg = _config_df(spark)
        n_replicated = gate_active_region(
            with_decoded(env), cfg, "us-east-1"
        ).count()
        t0 = time.time()
        q = run_replication_stream(
            read_envelope_stream(spark, stage, max_batches_per_trigger=1),
            cfg,
            "us-east-1",
            replicated_dir=os.path.join(work, "repl"),
            checkpoint_table_dir=os.path.join(work, "cp"),
            stream_checkpoint_dir=os.path.join(work, "wal"),
            exactly_once=exactly_once,
        )
        q.processAllAvailable()
        dt = time.time() - t0
        progress = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
        q.awaitTermination(30)
        trig = [
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
            }
            for p in progress
            if p.get("numInputRows")
        ]
        return {
            "sec": round(dt, 3),
            "rps": round(n_replicated / dt, 1),
            "n_triggers": len(trig),
            "triggers": trig,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_profile.json"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aws_kinesis_data_streams_replicator_spark.session import get_spark

    spark = get_spark("akr-stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT count(*) FROM range(1000000)").collect()

    report: dict = {"sf_dir": sf_dir, "modes": {}}
    for mode, eos in (("alo", False), ("eos", True)):
        run_once(spark, sf_dir, eos)  # warmup, discarded
        runs = [run_once(spark, sf_dir, eos) for _ in range(n_runs)]
        rps = sorted(r["rps"] for r in runs)
        report["modes"][mode] = {
            "median_rps": rps[len(rps) // 2],
            "runs_rps": rps,
            "runs_sec": [r["sec"] for r in runs],
            # per-trigger evidence from the median run
            "sample_triggers": runs[len(runs) // 2]["triggers"],
        }
        print(mode, "median rps:", rps[len(rps) // 2], flush=True)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
