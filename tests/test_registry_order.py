"""The driver's correctness gate checks the FIRST 50 registered queries,
so registration order is part of the contract.  Pin the round-10 window
(the 2 queries NEW in round 10 — the files_lifecycle and curation-v8
compositions — then the 24 late-r9 registrations that never saw a
driver window, then 24 staleness-refresh names: the 21 remaining
r3-era names plus the 3 oldest r4-era names): any refactor that
silently reorders the registry fails here before it costs a driver
round.  Rotating the window is an INTENTIONAL edit to both
_CHECK_FIRST and this pin.

Staleness reconstruction recipe: for each CORRECTNESS_r0*.json in round
order, record the latest round where a query was fully green
(rows+schema+hash, no err); sort ascending by that round.  After the
r10 window, the r3 era is exhausted and the 46 r4-era names head the
r11 refresh (the 3 oldest — agg_approx_distinct, agg_approx_percentile,
agg_countif_maxby — sit at positions 50-52, displaced from the r10
window by the three late-r10 registrations).  (The r10 rebuild found one stale line in the
staging notes: doc_tfidf_top_terms went green again inside the r9
window, while evt_sessionize_batch had not — always rebuild from the
artifacts, not the prose.)"""

from __future__ import annotations

# the round-10 window's first three names — a literal canary so a bad
# merge of the _CHECK_FIRST section fails loudly, not just consistently
_R10_HEAD = [
    "files_lifecycle",
    "pipeline_corpus_curation_v8",
    "graph_kcore_membership",
]

# the 29 risk-ordered names at the r10 head (5 new-in-r10 queries —
# two verdict-ask compositions, k-core, FD mining, the workload layout
# chooser — + 24 never-driver-checked late-r9 registrations) — pinned
# as a block so a partial rotation (some staged names dropped) fails
_R10_STAGED_29 = [
    "files_lifecycle",
    "pipeline_corpus_curation_v8",
    "graph_kcore_membership",
    "dq_functional_dependencies",
    "files_workload_layout_advisor",
    "emb_ann_ivf_coreset_topk",
    "emb_coreset_ivf_recall_eval",
    "files_compaction_incremental",
    "emb_coreset_fold_maintenance",
    "cdc_neardup_cluster_maintenance",
    "emb_hard_negative_mining",
    "dq_l_diversity",
    "dq_t_closeness",
    "files_bloom_pruning",
    "doc_chunk_windows",
    "emb_mmr_diversified_topk",
    "text_tokenizer_fertility",
    "part_skyline_pareto_front",
    "evt_sliding_distinct_users",
    "doc_holdout_leakage_rate",
    "mm_keyframe_select",
    "evt_sliding_hll_users",
    "pipeline_corpus_curation_v7",
    "doc_quality_quantile_norm",
    "files_hilbert_pruning",
    "plan_join_order_3way",
    "part_copurchase_topk",
    "evt_touch_attribution",
    "evt_markov_stationary",
]

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    _CHECK_FIRST,
)


def test_first_50_match_staged_check_order():
    assert list(QUERIES)[:50] == _CHECK_FIRST[:50]
    assert _CHECK_FIRST[:3] == _R10_HEAD
    assert _CHECK_FIRST[:29] == _R10_STAGED_29


def test_check_first_covers_whole_registry():
    # since r9 the list orders the ENTIRE registry, not just a prefix —
    # a new registration missing from it would land at an unpredictable
    # window position
    assert sorted(_CHECK_FIRST) == sorted(QUERIES)


def test_check_first_has_no_dupes_or_stale_names():
    assert len(_CHECK_FIRST) == len(set(_CHECK_FIRST))
    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    assert missing == []


def test_every_query_has_an_oracle():
    assert sorted(set(QUERIES) - set(ORACLE_SQL)) == []
