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
