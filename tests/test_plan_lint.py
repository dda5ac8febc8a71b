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

import pytest

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES

# queries whose CONSTRUCTION runs jobs (iterative connected components)
# — plan text of the final frame is meaningless for lint and building it
# is expensive; their plans are audited by their own tests
_SKIP = {
    "doc_neardup_clusters",
    "pipeline_corpus_curation_v2",
    "pipeline_corpus_curation_v4",  # CC iterations run jobs at construction
    "graph_pagerank",  # eager localCheckpoint runs jobs at construction
}

# deliberate scalar-broadcast (1-row build side) nested-loop joins
_BNLJ_OK = {
    "tpch_q11_important_stock",  # grand-total threshold
    "tpch_q15_top_supplier",  # max-revenue scalar
    "tpch_q22_global_sales_opportunity",  # positive-balance average
    "doc_balanced_sample",  # min-stratum-count scalar
    "pipeline_corpus_curation_v3",  # stratified threshold composition
    "tpch_q17_small_qty_revenue",  # single-row final aggregate join
    "tpch_q20_excess_shippers",  # above-average scalar total
    "agg_hll_sketch_union",  # 1-row exact total × 1-row sketch-union estimate
    "evt_user_rfm_segments",  # 1-row corpus-max scalar broadcast
    # recall eval embeds the brute-force baseline (emb_ann_topk, above)
    # as its ground-truth side — same bounded |Q|×N rationale
    "emb_ann_recall_eval",
    "emb_ann_topk",  # fixture-scale brute-force baseline (documented)
    # IVF cell assignment is vectors × centroids with a BOUNDED build
    # side (|cells|, ≤ thousands at any corpus size) — a deliberate
    # broadcast cross, not a join-key bug
    "emb_ann_ivf_topk",
    "emb_ann_ivf_kmeans_topk",
    "doc_tfidf_top_terms",  # corpus-size (N) 1-row scalar broadcast
    "doc_bm25_search",  # corpus stats (N, Σdl) 1-row scalar broadcast
    "text_pmi_collocations",  # corpus token total 1-row scalar broadcast
    # k-means assignment is vectors × centroids with a BOUNDED build side
    # (n_cells, ≤ thousands at any corpus size) — the IVF rationale
    "emb_semantic_dedup",
    # BM25 corpus-stats scalar + single-query-vector broadcast (|Q| = 1)
    "doc_hybrid_rrf",
    # prefix-dot stage is the deliberate small-|Q| broadcast (emb_ann_topk
    # rationale); the rerank stage joins only the 50-row shortlist
    "emb_matryoshka_staged_topk",
    "emb_knn_label_classify",  # brute-force stage: emb_ann_topk rationale
    "text_stopword_discovery",  # corpus doc-count 1-row scalar broadcast
    "text_bpe_merge_step",  # winning merge pair 1-row scalar broadcast
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
    "dq_unreferenced_dims",  # 1-row count x 1-row count per check
    # exact baseline leg (emb_ann_topk rationale) + IVF centroid cross
    "emb_ivf_probe_sweep",
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
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} has an unexpected broadcast nested-loop join — "
            "either fix the join key or allowlist a deliberate scalar "
            "broadcast"
        )


# --------------------------------------------------------------------------
# Source lint: no explicit F.broadcast() hint on a build side that
# aggregates by a PER-ENTITY key (user_id / doc_id / vec_id).  Such a
# rollup's cardinality grows with the data (|users|, |docs|, |vectors|),
# so a forced broadcast is a guaranteed driver/executor OOM at 100× —
# the round-4 verdict's exact finding.  Unhinted joins are fine (AQE
# broadcasts only when the runtime size is actually small); bounded
# keys (nation, label, cohort day, event_type, band) are fine.
# --------------------------------------------------------------------------

import ast
import pathlib
import re

_PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "aws_kinesis_data_streams_replicator_spark"
)

_ENTITY_GROUPBY = re.compile(
    r"\.groupBy\(\s*[\"'](user_id|doc_id|vec_id)[\"']"
)

# function names allowed to broadcast something the heuristic resolver
# cannot prove bounded, each with the boundedness argument
_ENTITY_BCAST_OK: dict[str, str] = {
    # broadcast sides are the 1-row min-user-id scalar and the SINGLE
    # query user's daily series (filtered to user_id == qid, so ≤ |days|
    # rows) — bounded by a filter, which the grouping-based resolver
    # can't see
    "evt_timeseries_similarity": "one user's ≤|days|-row series",
}

_COLLAPSES = re.compile(r"\.(groupBy|agg)\(")


def _entity_broadcast_hits():
    hits = []
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

            def entity_key(expr, depth=0):
                """Return the per-entity grouping key of the OUTERMOST
                cardinality-determining op in expr's lineage, or None.
                The outermost .groupBy()/.agg() re-keys the frame, so
                resolution stops there: a 1-row .agg() over a per-user
                rollup is bounded, while .groupBy('user_id') is not."""
                seg = ast.get_source_segment(src, expr) or ""
                m = _ENTITY_GROUPBY.search(seg)
                if m:
                    return m.group(1)
                if _COLLAPSES.search(seg):
                    return None  # re-keyed by a bounded/global grouping
                if depth >= 4:
                    return None
                for name_node in ast.walk(expr):
                    if isinstance(name_node, ast.Name):
                        for defn in assigns.get(name_node.id, []):
                            k = entity_key(defn, depth + 1)
                            if k:
                                return k
                return None

            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                    and node.args
                ):
                    key = entity_key(node.args[0])
                    if key and fn.name not in _ENTITY_BCAST_OK:
                        hits.append(
                            f"{path.relative_to(_PKG.parent)}:"
                            f"{node.lineno} ({fn.name}) broadcasts a "
                            f"rollup grouped by {key}"
                        )
    return hits


def test_no_per_entity_broadcast_hints():
    hits = _entity_broadcast_hits()
    assert not hits, (
        "explicit broadcast() of an unbounded per-entity rollup "
        "(driver OOM at scale) — drop the hint and let AQE decide, "
        "or rewrite as a window over the same partitioning:\n  "
        + "\n  ".join(hits)
    )
