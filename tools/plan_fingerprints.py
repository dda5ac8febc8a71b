"""Registry-wide physical-plan fingerprints: the structural counters
(joins by strategy, shuffles, scans with/without pushdown, Expand /
Window / Generate nodes) of EVERY registered query's plan, committed as
PLAN_FINGERPRINTS.json and diffed in CI.

This pins the plan-shape wins permanently: a regression that flips a
join strategy, introduces an Expand rewrite, or loses a pushed filter
fails `tests/test_plan_fingerprints.py` with the query named — before
it costs a bench round to notice.

Plans are BUILT, never executed (fingerprinting all 266 queries stays
cheap), so under AQE the counters describe the statically-planned shape
— exactly the shape that must be right for a cost model to start from
at 100 TB.  Generated at the tests' smoke fixture (sf0.001) so CI can
recompute byte-identical counters.

Usage:  python tools/plan_fingerprints.py [sf_dir] [out.json]

Regenerate (and review the diff!) after any INTENTIONAL plan change:

    python tools/plan_fingerprints.py            # writes PLAN_FINGERPRINTS.json
    git diff PLAN_FINGERPRINTS.json              # every changed counter is a
                                                 # plan-shape change you made
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    PLAN_BUILD_RUNS_JOBS,
    QUERIES,
)
from aws_kinesis_data_streams_replicator_spark.session import get_spark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(_REPO, "PLAN_FINGERPRINTS.json")
DEFAULT_SF = "/root/testdata/sf0.001"


def fingerprint(plan: str) -> dict:
    """Structural counters of one physical plan string.  Counts only —
    no node ids, no expression ids — so the fingerprint is stable
    across sessions while still catching any strategy flip."""
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition"),
        "expands": plan.count("Expand"),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "generates": plan.count("Generate "),
        "scans": plan.count("Scan parquet") + plan.count("Scan ExistingRDD"),
        "scans_with_pushed_filters": len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        ),
        "scans_without_pushed_filters": plan.count("PushedFilters: []"),
        "python_eval": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas")
        + plan.count("PythonUDTF"),
    }


# ---------------------------------------------------------------------------
# Global-window lint (round 8): a Window with an EMPTY partition spec
# plans `Exchange SinglePartition` under its Sort — every input row
# through ONE task.  Over an unbounded input that task is the straggler
# at 100×.  Bounded inputs are fine and recognized structurally:
#   * TakeOrderedAndProject / GlobalLimit / LocalLimit / CollectLimit
#     ABOVE the exchange (the window ranks k already-cut survivors);
#   * the exchange feeding straight from a HashAggregate keyed on a
#     physical-partition id (`_pid`) — the ≤P-row offset rollup of
#     operators/prefix.py — or from any global (keyless) aggregate.
# ---------------------------------------------------------------------------

_TREE_ART = re.compile(r"^[\s:+*\-()0-9]*")
_BOUNDED_NODE = re.compile(
    r"^(TakeOrderedAndProject|GlobalLimit|LocalLimit|CollectLimit)"
)
_PID_SUMMARY = re.compile(r"^HashAggregate\(keys=\[_pid\b")
_GLOBAL_AGG = re.compile(r"^HashAggregate\(keys=\[\]")


def _node_text(line: str) -> str:
    """Strip the tree-art prefix (`+- `, `:- `, `*(3) `, indent)."""
    return _TREE_ART.sub("", line)


# Nodes a Window's input can pass through WITHOUT changing whether the
# feed is bounded: between the Window and its exchange, and between the
# exchange and its producer.  Anything not in these sets is decisive.
_ABOVE_PASSTHROUGH = ("Sort", "Project", "Filter", "ColumnarToRow")
_BELOW_PASSTHROUGH = (
    "Project",
    "Filter",
    "Sort",
    "Exchange RoundRobinPartitioning",
    "ColumnarToRow",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "InputAdapter",
)


def global_window_violations(plan: str) -> list[str]:
    """Return one entry per Window node whose `Exchange SinglePartition`
    is fed by an unbounded input — the plan shape that serializes at
    scale.  Empty list = every global window in the plan is over a
    limit-cut or a ≤P-row partition-id/global-agg summary.

    Both walks run until a DECISIVE node, not a fixed line budget (a
    fixed horizon silently passed any window whose unbounded producer
    sat behind more pass-through nodes than the budget — lint false
    negatives on deep plans).  Exhausting the plan below an exchange
    without finding a bounding producer counts as a violation."""
    lines = plan.splitlines()
    nodes = [_node_text(ln) for ln in lines]
    bad = []
    for i, node in enumerate(nodes):
        if not node.startswith("Window"):
            continue
        # walk the child chain down to the window's own exchange
        for j in range(i + 1, len(nodes)):
            nxt = nodes[j]
            if _BOUNDED_NODE.match(nxt):
                break  # ranked input already cut to k rows
            if nxt.startswith("Exchange SinglePartition"):
                # look through pass-through nodes below the exchange
                # for a bounding producer (limit cut, ≤P-row _pid
                # rollup, keyless 1-row aggregate); plan exhaustion
                # without one = violation
                bounded = False
                for b in range(j + 1, len(nodes)):
                    below = nodes[b]
                    if (
                        _PID_SUMMARY.match(below)
                        or _GLOBAL_AGG.match(below)
                        or _BOUNDED_NODE.match(below)
                    ):
                        bounded = True
                        break
                    if not below.startswith(_BELOW_PASSTHROUGH):
                        break  # decisive unbounded producer
                if not bounded:
                    bad.append(node[:120])
                break
            if nxt.startswith("Exchange") or nxt.startswith("Window"):
                break  # partitioned window / nested window (own check)
            if not nxt.startswith(_ABOVE_PASSTHROUGH):
                break  # decisive non-exchange producer: the window
                # inherits an existing (co-)partitioning — no single-
                # partition exchange exists in its direct child chain
    return bad


def build_plan(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def compute_all(spark, sf_dir: str) -> dict:
    out = {}
    for name in sorted(QUERIES):
        if name in PLAN_BUILD_RUNS_JOBS:
            continue
        out[name] = fingerprint(build_plan(spark, name, sf_dir))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    out_path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    spark = get_spark("akr-plan-fingerprints")
    spark.sparkContext.setLogLevel("ERROR")
    fps = compute_all(spark, sf_dir)
    payload = {
        "sf_dir": sf_dir,
        "fingerprints": fps,
        # self-documenting exclusions: fingerprints ∪ excluded must
        # equal the registry (tests/test_parity_artifacts.py asserts
        # it), so a new registration can never silently fall out of
        # the plan gate
        "excluded": sorted(PLAN_BUILD_RUNS_JOBS),
        "excluded_reason": (
            "plan CONSTRUCTION runs Spark jobs for these iterative "
            "queries (connected components, PageRank, eager "
            "checkpoint pipelines) — the final frame's static plan "
            "text is meaningless and expensive to build; their plans "
            "are audited by their own tests"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{len(fps)} fingerprints -> {out_path}")


if __name__ == "__main__":
    main()
