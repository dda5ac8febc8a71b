"""Dump ``.explain("formatted")`` for named registered queries.

Writes ``plans/r12/<query>_<tag>.txt`` for each query named on the
command line (or every query with ``--all``) — the judge-facing
before/after plan evidence for the optimization rounds.

Usage:  python tools/explain_dump.py <tag> <query> [query ...]
        python tools/explain_dump.py <tag> --all
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    PLAN_BUILD_RUNS_JOBS,
    QUERIES,
)
from aws_kinesis_data_streams_replicator_spark.session import get_spark


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:]
    if names == ["--all"]:
        names = sorted(QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("akr-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name in PLAN_BUILD_RUNS_JOBS:
            # plan construction runs jobs (iterative loops); the final
            # frame's plan still shows the converged shape — dump it,
            # but note the caveat in the file header
            header = (
                "-- NOTE: plan construction runs jobs (iterative); this is"
                " the FINAL frame's plan (last iteration + output stage)\n"
            )
        else:
            header = ""
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(header + txt)
        print(path)


if __name__ == "__main__":
    main()
