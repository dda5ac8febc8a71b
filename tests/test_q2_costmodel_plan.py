"""Round-9: the sketch catalog demonstrably changes a real registered
plan.  tpch_q2_min_cost_supplier's lineitem ⋈ eur join is planned by
costmodel.plan_equijoin_from_catalog — the catalog sketch proves |eur|
small, so the broadcast hint lands at STATIC planning time (Catalyst's
size-only estimator over-costed the supplier⋈nation⋈region build side
and sort-merged, shuffling the whole fact: the r6–r8 bench debt).

The coarse PLAN_FINGERPRINTS counters cannot see this change (total
BHJ/SMJ counts happen to balance), so the strategy is pinned here by
join direction: the costs-leg join must be a BroadcastHashJoin with
the eur side as build."""

from __future__ import annotations

import re

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q2_costs_leg_is_broadcast_hash_join(spark, sf_dir):
    plan = _executed(QUERIES["tpch_q2_min_cost_supplier"](spark, sf_dir))
    # the wired join: eur keys (build, left) broadcast into the
    # lineitem probe — s_suppkey listed first, BuildLeft
    assert re.search(
        r"BroadcastHashJoin \[s_suppkey#\d+L?\], \[l_suppkey#\d+L?\], "
        r"Inner, BuildLeft",
        plan,
    ), (
        "the sketch-planned lineitem⋈eur join lost its broadcast hint "
        "— the static plan is sort-merging the fact again:\n"
        + "\n".join(ln for ln in plan.splitlines() if "Join" in ln)
    )


def test_q2_replan_hits_warm_catalog(spark, sf_dir, tmp_path, monkeypatch):
    """Second construction must read the persisted sketches, not
    rebuild them (cache-on-miss warms the catalog)."""
    import aws_kinesis_data_streams_replicator_spark.operators.costmodel as cm

    monkeypatch.setattr(
        "tempfile.gettempdir", lambda: str(tmp_path)
    )
    QUERIES["tpch_q2_min_cost_supplier"](spark, sf_dir)  # cold: builds
    calls = []
    orig = cm.write_key_sketch

    def counting(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(cm, "write_key_sketch", counting)
    QUERIES["tpch_q2_min_cost_supplier"](spark, sf_dir)  # warm: reads
    assert calls == [], "warm catalog must not rebuild sketches"
