"""Registry-wide physical-plan lint: scale discipline enforced in CI.

Every registered batch query's executed plan is checked for the two
shapes that kill a 100 TB run:

* ``CartesianProduct`` — never acceptable;
* ``BroadcastNestedLoopJoin`` — acceptable ONLY for the deliberate
  1-row scalar-broadcast pattern (threshold against a grand total) or
  an explicitly allowlisted small-fixture baseline.

Catching a regression here is cheap (plan build only); catching it in
production is a cluster on fire.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    PLAN_BUILD_RUNS_JOBS,
    QUERIES,
)

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
from tools.plan_fingerprints import (  # noqa: E402
    DEFAULT_OUT,
    fingerprint,
    global_window_violations,
)

# queries whose CONSTRUCTION runs jobs (iterative connected components,
# eager localCheckpoints) — plan text of the final frame is meaningless
# for lint and building it is expensive; their plans are audited by
# their own tests
_SKIP = PLAN_BUILD_RUNS_JOBS

with open(DEFAULT_OUT) as _fh:
    _COMMITTED_FPS = json.load(_fh)["fingerprints"]

# deliberate scalar-broadcast (1-row build side) nested-loop joins.
# SELF-PRUNING: test_bnlj_allowlist_entry_still_has_bnlj fails on any
# entry whose plan no longer contains a BNLJ (9 stale entries from the
# r8 rewrites were pruned when the anti-rot test landed in r9)
_BNLJ_OK = {
    "tpch_q11_important_stock",  # grand-total threshold
    "tpch_q22_global_sales_opportunity",  # positive-balance average
    "doc_balanced_sample",  # min-stratum-count scalar
    "tpch_q20_excess_shippers",  # above-average scalar total
    "agg_hll_sketch_union",  # 1-row exact total × 1-row sketch-union estimate
    "dq_record_linkage",  # 1-row entity-universe count scalar broadcast (x2)
    "evt_selfjoin_size_estimate",  # 1-row exact-F2 x 1-row CMS estimate
    "agg_join_size_estimate",  # 1-row exact-size x 1-row CMS estimate
    "agg_weighted_join_size_estimate",  # same 1-row x 1-row shape
    "plan_join_order_3way",  # five 1-row planning scalars crossed
    "files_bloom_pruning",  # 1-row domain scalar + 2-row per-layout nf cross
    # (files_zorder_pruning / files_hilbert_pruning / files_lifecycle
    # dropped in r12: layout_pruning_stats now derives the domain from
    # the per-file rollup — the 1-row domain scalar cross is gone)
    # 1-row convergence-witness count cross (survivor-set equality)
    "graph_kcore_membership",
    # 1-row argmin-struct cross over the ≤|layouts|-row cost rollup
    # + the shared span-audit domain scalar
    "files_workload_layout_advisor",
    "dq_linkage_blocking_eval",  # 1-row entity-count scalar broadcast
    "dq_t_closeness",  # 1-row global sensitive-distribution broadcast
    "doc_holdout_leakage_rate",  # three 1-row summary aggregates crossed
    # recall eval embeds the brute-force baseline (emb_ann_topk, above)
    # as its ground-truth side — same bounded |Q|×N rationale
    "emb_ann_recall_eval",
    "emb_ann_topk",  # fixture-scale brute-force baseline (documented)
    # IVF cell assignment is vectors × centroids with a BOUNDED build
    # side (|cells|, ≤ thousands at any corpus size) — a deliberate
    # broadcast cross, not a join-key bug (since r12 the centroids
    # cross as ONE array row feeding the per-row argmax expression)
    "emb_ann_ivf_topk",
    "emb_ann_ivf_kmeans_topk",
    # PQ encode: the 1-row codebook-array cross (n_sub·n_cent bounded
    # structs) behind the per-row per-subspace argmin — same rationale
    "emb_ann_pq_topk",
    # (pipeline_corpus_curation_v8 moved to PLAN_BUILD_RUNS_JOBS in r12
    # — its per-stage discipline is covered by _STAGED_COMPOSITIONS)
    # the audit report: a chain of 1-row × 1-row summary crosses
    # (residuals, leakage, coverage, drift) onto the 1-row manifest
    "pipeline_publication_audit",
    "doc_tfidf_top_terms",  # corpus-size (N) 1-row scalar broadcast
    "doc_bm25_search",  # corpus stats (N, Σdl) 1-row scalar broadcast
    # same corpus-stats 1-row scalar broadcast, multi-query form
    "doc_retrieval_ranking_eval",
    "text_pmi_collocations",  # corpus token total 1-row scalar broadcast
    # BM25 corpus-stats scalar + single-query-vector broadcast (|Q| = 1)
    "doc_hybrid_rrf",
    # prefix-dot stage is the deliberate small-|Q| broadcast (emb_ann_topk
    # rationale); the rerank stage joins only the 50-row shortlist
    "emb_matryoshka_staged_topk",
    "emb_knn_label_classify",  # brute-force stage: emb_ann_topk rationale
    "text_stopword_discovery",  # corpus doc-count 1-row scalar broadcast
    "text_bpe_merge_step",  # winning merge pair 1-row scalar broadcast
    # per-round winning-pair 1-row broadcasts + the 1-row merge table
    # at map-back (bpe_merge_step rationale, iterated)
    "text_bpe_apply",
    # 1-row total-eps scalar broadcast (summary-merge error bound)
    "text_heavy_hitters_bounds",
    # type-pair join over the |event_types|-row sketch rollup — bounded
    # build side (≤ dozens of types), deliberate inequality pair join
    "agg_hll_overlap_estimate",
    "doc_epochs_to_budget",  # corpus token-total 1-row scalar broadcast
    # 1-row plain-metrics agg × 1-row distinct-counts agg (the split
    # that dodges the multi-distinct expand rewrite; see profiling.py)
    "dq_profile_orders",
    # query-user series + 1-row norm scalars broadcast (sparse top-k)
    "evt_timeseries_similarity",
    # brute-force halves (emb_ann_topk rationale) + 1-row median scalar
    "emb_incremental_topk_maintenance",
    # 30-row day-spine broadcast range probe (at-risk counting)
    "evt_survival_risk_table",
    "evt_decile_lift_table",  # 1-row population-totals scalar broadcast
    # round-8 prefix rewrites: 1-row total / count scalar broadcasts
    # (with_global_ntile's n, Pareto's grand total, coverage's corpus
    # token total)
    "text_vocab_coverage_curve",
    # 1-row side-count x 1-row bound crosses in the planning record
    "plan_join_strategy_hook",
    "dq_unreferenced_dims",  # 1-row count x 1-row count per check
    # exact baseline leg (emb_ann_topk rationale) + IVF centroid cross
    "emb_ivf_probe_sweep",
    # 1-row corpus/target token-totals scalar broadcast (the two count
    # models themselves are bounded ≤256-row broadcast HASH joins)
    "doc_importance_weights",
    # embeds the importance-weight leg (same 1-row totals cross)
    "pipeline_corpus_curation_v6",
    # two 1-row shard-totals crosses (one per shard model)
    "cdc_importance_model_maintenance",
    # (emb_kcenter_coreset dropped in r12: the k-row pick set is now
    # pinned behind a lazy checkpoint, so its per-round 1-row
    # next-center broadcasts no longer appear in the STATIC plan —
    # they still execute inside the checkpoint subtree, with the same
    # bounded-TakeOrdered(1) rationale, shared once by all consumers)
    # embed the kcenter chain as IVF seeding (same per-round 1-row
    # broadcasts) + the 8-row centroid-set broadcast cross
    "emb_ann_ivf_coreset_topk",
    # same kcenter seeding + 8-row centroid cross, plus the 8-cell ×
    # |sources| domain-bounded mixture grid and the 1-row corpus total
    "emb_cluster_mixture_report",
    "emb_coreset_ivf_recall_eval",
    # three kcenter chains (per-round 1-row broadcasts) + the 8-row
    # folded-pick coverage cross + four 1-row radius/cover crosses
    "emb_coreset_fold_maintenance",
    # the two epochs' 1-row open-bin max crosses + the 1-row emitted
    # counters continuing the global bin ids
    "files_compaction_incremental",
    # 1-row digit-total scalar broadcast over the 9-row Benford table
    "dq_benford_first_digit",
    "part_association_rules",  # 1-row basket-total scalar broadcast
    # 1-row series-stats + 1-row changepoint scalar broadcasts
    "evt_changepoint_cusum",
    # 2-row dimension cross over the calendar-bounded hourly rollup
    "evt_seasonal_strength_anova",
    # 1-row type-count cross (uniform init) + 1-row iterate-sum cross
    # over the bounded |types| stationary vector
    "evt_markov_stationary",
    # importance totals + 1-row budget scalar crosses
    "doc_token_budget_allocation",
    # four 1-row sketch-summary scalars (per-cohort estimates, union
    # estimate, rho membership count) crossed into the single-row
    # set-operations report
    "agg_kmv_set_operations",
    # 1-row NB-types scalar broadcast (vocab size + discount mass) over
    # the bigram-TYPE table — agg_hll_sketch_union rationale; the build
    # side is the single Kneser–Ney normalization row (text.py:1338)
    "text_kneser_ney_bigrams",
}


# Global windows (empty partition spec → Exchange SinglePartition) the
# structural detector cannot prove bounded, each with the boundedness
# argument.  Every entry's window input is a SUMMARY whose cardinality
# is fixed by DOMAIN (calendar span, config count, hash-bucket modulus,
# frequency threshold), not by corpus row count — so the single
# partition holds thousands of rows at ANY scale.  Anything else that
# trips the detector is a real scale bug: fix the plan
# (orderBy().limit(k), operators/prefix.py) instead of extending this
# list.
_GLOBAL_WINDOW_OK: dict[str, str] = {
    "doc_lsh_band_sweep": "lag over the ≤3-row band-config sweep",
    "doc_lsh_precision_eval": "rollup per band config (≤ dozens)",
    "doc_mixture_weights": "per-source rollup (bounded domain)",
    "doc_token_budget_allocation": "cumulative walk over the "
    "|lang|x|source| strata rollup (bounded domain)",
    "dq_skew_profile": "window over exactly 32 hash buckets",
    "evt_cumulative_new_users": "running sum over the per-hour rollup "
    "(calendar-bounded)",
    "evt_error_budget_burn": "running sum over the per-day rollup",
    "evt_peak_concurrency": "running max over the per-day rollup",
    "evt_rolling_corr": "rolling window over the per-day rollup",
    "evt_sliding_hll_users": "suite-mean accuracy claim over the "
    "per-window rollup (calendar-bounded |hours| rows)",
    "text_stopword_discovery": "rank over words with df ≥ 60% of docs "
    "(≤ avg distinct words/doc ÷ 0.6 by the df-sum bound)",
    "tpch_revenue_mom_growth": "lag over the per-month rollup",
    "evt_changepoint_cusum": "cumulative deviation over the per-hour "
    "rollup (calendar-bounded)",
    "tpch_running_backlog": "running sum over the per-day rollup",
}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - _SKIP))
def test_no_pathological_joins(spark, sf_dir, name):
    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} builds a cartesian product"
    # Round-8 lint: no single-partition WindowExec over unbounded input.
    # The detector recognizes limit-cut inputs (TakeOrdered/GlobalLimit),
    # the ≤P-row _pid offset rollup of operators/prefix.py, and keyless
    # 1-row aggregates; everything else must be domain-bounded and
    # allowlisted above with its bound.
    gw = global_window_violations(plan)
    if name not in _GLOBAL_WINDOW_OK:
        assert not gw, (
            f"{name} plans a single-partition window over unbounded "
            f"input — the stage that serializes at 100×. Rewrite with "
            f"orderBy().limit(k) + bounded re-rank or "
            f"operators/prefix.py (with_global_prefix / "
            f"with_global_ntile), or document a domain bound in "
            f"_GLOBAL_WINDOW_OK. Offending windows: {gw}"
        )
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} has an unexpected broadcast nested-loop join — "
            "either fix the join key or allowlist a deliberate scalar "
            "broadcast"
        )
    # Plan-fingerprint regression gate (round-6): the structural
    # counters of every query's statically-planned shape are pinned in
    # PLAN_FINGERPRINTS.json.  A strategy flip, a new Expand, a lost
    # pushdown, or an extra shuffle fails HERE with the query named.
    # An INTENTIONAL plan change is a two-step edit: make it, then
    # `python tools/plan_fingerprints.py` and review the JSON diff.
    committed = _COMMITTED_FPS.get(name)
    assert committed is not None, (
        f"{name} has no committed plan fingerprint — regenerate with "
        "`python tools/plan_fingerprints.py`"
    )
    current = fingerprint(plan)
    diff = {
        k: (committed.get(k), v)
        for k, v in current.items()
        if committed.get(k) != v
    }
    assert not diff, (
        f"{name}: plan shape changed vs PLAN_FINGERPRINTS.json "
        f"(committed, current): {diff} — if intentional, regenerate "
        "with `python tools/plan_fingerprints.py` and review the diff"
    )


# --------------------------------------------------------------------------
# Source lint: no explicit F.broadcast() hint on a build side whose
# cardinality GROWS WITH THE DATA.  Two unbounded classes:
#
# * a rollup grouped by a per-entity key (user_id / doc_id / vec_id) or
#   an SF-scaling TPC-H key (custkey / suppkey / partkey / orderkey) —
#   |users|, |parts|, |orders| all grow linearly with corpus size;
# * a raw scan of an SF-scaling base table (customer, supplier, part,
#   orders, lineitem, documents, embeddings, events) that reaches the
#   broadcast without passing through a cardinality collapse — a
#   selective filter does NOT bound it (0.1% of 100 TB is 100 GB).
#
# A forced broadcast of either is a guaranteed driver/executor OOM at
# 100× — the round-4/round-5 verdict findings.  Unhinted joins are fine
# (AQE broadcasts only when the runtime size is actually small);
# bounded keys (nation, region, label, cohort day, event_type, band,
# calendar) and 1-row/global aggregates are fine and may keep hints.
# --------------------------------------------------------------------------

import ast
import pathlib
import re

_PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "aws_kinesis_data_streams_replicator_spark"
)

_UNBOUNDED_KEYS = (
    "user_id|doc_id|vec_id"
    "|c_custkey|o_custkey|s_suppkey|l_suppkey|p_partkey|l_partkey"
    "|o_orderkey|l_orderkey"
)
_UNBOUNDED_GROUPBY = re.compile(
    rf"\.groupBy\((?:\s*F\.col\()?\s*[\"']({_UNBOUNDED_KEYS})[\"']"
)
_ANY_GROUPBY = re.compile(r"\.groupBy\(")
_ANY_AGG = re.compile(r"\.agg\(")
_SF_SCALING_SCAN = re.compile(
    r"_t\(\s*spark,\s*sf_dir,\s*[\"']"
    r"(customer|supplier|part|orders|lineitem|documents|embeddings|events)"
    r"[\"']\s*\)"
)

# function names allowed to broadcast something the heuristic resolver
# cannot prove bounded, each with the boundedness argument
_BCAST_OK: dict[str, str] = {
    # broadcast sides are the 1-row min-user-id scalar and the SINGLE
    # query user's daily series (filtered to user_id == qid, so ≤ |days|
    # rows) — bounded by a filter predicate on the entity key itself,
    # which the grouping-based resolver can't see
    "evt_timeseries_similarity": "one user's ≤|days|-row series",
    # med/mad are per-event_type rank-median rollups (bounded domain,
    # ≤ dozens of types) built by a local helper whose .groupBy() the
    # lineage resolver can't see through
    "agg_mad_outliers": "per-event_type rank-median rollup",
    # the |Q| query-set broadcast (emb_ann_topk rationale): at scale Q
    # is an external bounded query list, modeled at fixture scale as a
    # 1% vec_id sample of the corpus
    "emb_filtered_ann_topk": "bounded query-set broadcast",
    # every broadcast side is a 1-row planning scalar: the two CMS
    # intermediate bounds come from costmodel.cms_join_bound (whose
    # collapsing .agg() over ≤4096-cell grids the lexical resolver
    # can't see through), the rest are global count aggregates
    "plan_join_order_3way": "1-row CMS bounds + 1-row exact counts",
    # every broadcast arg here is a 1-row frame: coverage_radius's
    # global max-of-min aggregate and the three radius aggregates —
    # the first is built inside similarity.coverage_radius, whose
    # collapsing .agg() the lexical resolver can't see through
    "emb_coreset_fold_maintenance": "1-row coverage/radius aggregates",
}


def _outermost_key(seg: str):
    """Classify the OUTERMOST cardinality-determining op of a fluent
    chain's source text.  In a method chain the outermost op is the
    LAST in text order, so: take the last ``.groupBy(`` — if ≥2
    ``.agg(`` calls follow it, a later global aggregate re-collapsed
    the frame (bounded); otherwise the frame is keyed by that groupBy.
    No groupBy but an ``.agg(`` → global 1-row aggregate (bounded).
    Returns ('unbounded', key) | ('bounded', None) | ('none', None)."""
    gbs = list(_ANY_GROUPBY.finditer(seg))
    if not gbs:
        return ("bounded", None) if _ANY_AGG.search(seg) else ("none", None)
    last_gb = gbs[-1]
    aggs_after = [m for m in _ANY_AGG.finditer(seg) if m.start() > last_gb.start()]
    if len(aggs_after) >= 2:
        return ("bounded", None)
    m = _UNBOUNDED_GROUPBY.match(seg, last_gb.start())
    if m:
        return ("unbounded", m.group(1))
    return ("bounded", None)


def _broadcast_hits():
    """(fn_name, message) for every broadcast() whose build-side
    lineage the resolver cannot prove bounded — UNFILTERED, so the
    allowlist test below can assert each _BCAST_OK entry still trips
    (self-pruning, like the BNLJ / global-window allowlists)."""
    raw = []
    for path in sorted(_PKG.rglob("*.py")):
        src = path.read_text()
        if "broadcast(" not in src:
            continue
        tree = ast.parse(src)
        for fn in [
            n for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]:
            # variable -> every expression ever assigned to it in this fn
            assigns: dict[str, list[ast.expr]] = {}
            for node in ast.walk(fn):
                if isinstance(node, ast.Assign):
                    for tgt in node.targets:
                        if isinstance(tgt, ast.Name):
                            assigns.setdefault(tgt.id, []).append(node.value)

            def resolve(expr, depth=0):
                """Return a problem string for expr's lineage, or None.
                Resolution stops at the outermost cardinality collapse:
                a 1-row .agg() or a bounded-key .groupBy() over an
                SF-scaling scan is bounded; an unbounded-key groupBy or
                a raw SF-scaling scan with no collapse is flagged."""
                seg = ast.get_source_segment(src, expr) or ""
                kind, key = _outermost_key(seg)
                if kind == "unbounded":
                    return f"a rollup grouped by {key}"
                if kind == "bounded":
                    return None
                m = _SF_SCALING_SCAN.search(seg)
                if m:
                    return f"an uncollapsed scan of SF-scaling table {m.group(1)}"
                if depth >= 4:
                    return None
                for name_node in ast.walk(expr):
                    if isinstance(name_node, ast.Name):
                        for defn in assigns.get(name_node.id, []):
                            p = resolve(defn, depth + 1)
                            if p:
                                return p
                return None

            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                    and node.args
                ):
                    problem = resolve(node.args[0])
                    if problem:
                        raw.append((fn.name, (
                            f"{path.relative_to(_PKG.parent)}:"
                            f"{node.lineno} ({fn.name}) broadcasts {problem}"
                        )))
    return raw


def test_no_unbounded_broadcast_hints():
    hits = [msg for fn, msg in _broadcast_hits() if fn not in _BCAST_OK]
    assert not hits, (
        "explicit broadcast() of a build side that grows with the data "
        "(driver OOM at scale) — drop the hint and let AQE decide, or "
        "rewrite as a window over the same partitioning:\n  "
        + "\n  ".join(hits)
    )


# --------------------------------------------------------------------------
# Detector self-tests: the global-window lint must FIRE on a deliberate
# violation and stay quiet on every sanctioned bounded shape.  Built
# from real Spark plans (not synthetic strings) so a plan-format change
# in a Spark upgrade breaks these tests, not silently the lint.
# --------------------------------------------------------------------------


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_window_lint_fires_on_violation(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    bad = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("k", "id"))
    )
    assert global_window_violations(_executed(bad)), (
        "detector must flag row_number over an unpartitioned window "
        "on unbounded input"
    )


def test_global_window_lint_allows_bounded_shapes(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_kinesis_data_streams_replicator_spark.operators.prefix import (
        with_global_prefix,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    # limit-cut input: rank over TakeOrderedAndProject survivors
    cut = (
        df.orderBy("k", "id")
        .limit(10)
        .withColumn("rn", F.row_number().over(Window.orderBy("k", "id")))
    )
    assert not global_window_violations(_executed(cut))
    # partitioned window: no single-partition exchange at all
    pw = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert not global_window_violations(_executed(pw))
    # the prefix helper's own plans (mono-id path and the ≤P-row _pid
    # offset window) must both pass their own lint
    rn_only = with_global_prefix(df, [F.col("k"), F.col("id")], rn_col="rn")
    assert not global_window_violations(_executed(rn_only))
    with_cum = with_global_prefix(
        df, [F.col("k"), F.col("id")], rn_col="rn", cum_cols=["id"]
    )
    assert not global_window_violations(_executed(with_cum))


def test_global_window_lint_walks_past_deep_passthrough_chains():
    """Regression pin for the r8 fixed scan horizon: a single-partition
    window whose unbounded producer sat behind MORE pass-through nodes
    than the 8/7-line budget was silently passed ('fell through the
    scan horizon: treat as OK').  Catalyst collapses adjacent
    Project/Filter pairs, so a real plan can't be coerced into an
    arbitrarily deep chain — this one test uses a synthetic plan string
    to pin the walk-until-decisive behavior directly."""
    above = ["Window [row_number() AS rn], [k ASC NULLS FIRST]"]
    above += [f"+- Project [k#{i}]" for i in range(6)]
    above += ["+- Sort [k ASC NULLS FIRST], false, 0"]
    above += ["+- Exchange SinglePartition, ENSURE_REQUIREMENTS"]
    deep_below = [f"   +- Filter (k#{i} > 0)" if i % 2 else f"   +- Project [k#{i}]" for i in range(10)]
    unbounded = ["      +- FileScan parquet [k] PushedFilters: []"]
    plan = "\n".join(above + deep_below + unbounded)
    assert global_window_violations(plan), (
        "deep pass-through chain over an unbounded scan must still "
        "be flagged"
    )
    bounded = "\n".join(
        above + deep_below + ["      +- HashAggregate(keys=[_pid#1], functions=[count(1)])"]
    )
    assert not global_window_violations(bounded), (
        "the ≤P-row _pid offset rollup stays sanctioned behind the "
        "same deep chain"
    )
    # plan exhaustion below the exchange without a bounding producer is
    # a violation, not OK
    exhausted = "\n".join(above + deep_below)
    assert global_window_violations(exhausted)


# --------------------------------------------------------------------------
# Allowlist anti-rot (round 9): a rewrite that removes the global
# window / BNLJ must also PRUNE the allowlist entry, else the stale
# entry later masks a real regression under the same query name.  Each
# entry must still exhibit the plan shape it is excusing.
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", sorted(set(_GLOBAL_WINDOW_OK) - _SKIP)
)
def test_global_window_allowlist_entry_still_trips_detector(
    spark, sf_dir, name
):
    plan = _executed(QUERIES[name](spark, sf_dir))
    assert global_window_violations(plan), (
        f"{name} no longer trips the global-window detector — its "
        "_GLOBAL_WINDOW_OK entry is stale; prune it"
    )


@pytest.mark.parametrize("name", sorted(_BNLJ_OK - _SKIP))
def test_bnlj_allowlist_entry_still_has_bnlj(spark, sf_dir, name):
    plan = _executed(QUERIES[name](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, (
        f"{name} no longer plans a BroadcastNestedLoopJoin — its "
        "_BNLJ_OK entry is stale; prune it"
    )


def test_allowlists_reference_only_live_queries():
    assert sorted(set(_GLOBAL_WINDOW_OK) - set(QUERIES)) == []
    assert sorted(_BNLJ_OK - set(QUERIES)) == []


def test_bcast_allowlist_entries_still_trip():
    """Anti-rot (the _BNLJ_OK / _GLOBAL_WINDOW_OK discipline): every
    _BCAST_OK function must still contain a broadcast() the lineage
    resolver flags — an entry whose function was rewritten (or
    deleted) no longer needs its exemption, and keeping it could mask
    a future real unbounded broadcast under the same name."""
    tripped = {fn for fn, _ in _broadcast_hits()}
    stale = set(_BCAST_OK) - tripped
    assert not stale, (
        f"stale _BCAST_OK entries (no flagged broadcast remains): "
        f"{sorted(stale)} — prune them"
    )


# --------------------------------------------------------------------------
# Per-stage lint for checkpointed compositions (the r10 verdict's audit
# blind spot): localCheckpoint truncates lineage, so the final plan of a
# composition shows its upstream legs only as "Scan ExistingRDD" — a
# cartesian introduced INSIDE a checkpointed stage would pass the plan
# lint above.  Capture every checkpointed stage via the plan_audit
# recorder and lint each stage's own executed plan.
# --------------------------------------------------------------------------

_STAGED_COMPOSITIONS = [
    "pipeline_corpus_curation_v8",
    "files_lifecycle",
    "cdc_corpus_refresh_delta",
]


@pytest.mark.parametrize("name", _STAGED_COMPOSITIONS)
def test_checkpointed_stages_have_no_cartesian(spark, name):
    from tools.plan_audit import checkpoint_recorder

    rec = checkpoint_recorder()
    with rec:
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        df.collect()
    assert rec.stages, f"{name} recorded no checkpointed stages"
    for label, sdf in rec.stages:
        plan = sdf._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, (
            f"{name} stage ({label}) builds a cartesian product hidden "
            "behind a localCheckpoint"
        )
