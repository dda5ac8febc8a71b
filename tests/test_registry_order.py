"""The driver's correctness gate checks the FIRST 50 registered queries,
so registration order is part of the contract.  Pin the round-9 window
(the 20 late-r8 registrations that never saw a driver window, then the
one query whose plan changes in round 9 — tpch_q2_min_cost_supplier,
costmodel-driven broadcast — then 29 staleness-refresh names: the 3
r2-era names the r8 rotation deferred plus the oldest 26 r3-era names):
any refactor that silently reorders the registry fails here before it
costs a driver round.  Rotating the window is an INTENTIONAL edit to
both _CHECK_FIRST and this pin.

Staleness reconstruction recipe: for each CORRECTNESS_r0*.json in round
order, record the latest round where a query was fully green
(rows+schema+hash, no err); sort ascending by that round.  After the r9
window, the remaining r3-era names (21 of 47) head the r10 refresh."""

from __future__ import annotations

# the round-9 window's first three names — a literal canary so a bad
# merge of the _CHECK_FIRST section fails loudly, not just consistently
_R9_HEAD = ["plan_join_strategy_hook", "agg_weighted_join_size_estimate",
            "mm_audio_features"]

# the 21 risk-ordered names at the r9 head (20 never-driver-checked
# late-r8 registrations + the one r9 plan change) — pinned as a block
# so a partial rotation (some staged names dropped) fails
_R9_STAGED_21 = [
    "plan_join_strategy_hook",
    "agg_weighted_join_size_estimate",
    "mm_audio_features",
    "files_zorder_pruning",
    "text_bigram_lm_score",
    "files_compaction_plan",
    "mm_image_phash_groups",
    "doc_importance_weights",
    "cdc_importance_model_maintenance",
    "pipeline_corpus_curation_v6",
    "emb_kcenter_coreset",
    "evt_autocorrelation_lags",
    "dq_benford_first_digit",
    "part_association_rules",
    "evt_changepoint_cusum",
    "emb_quantization_error_audit",
    "text_ngram_novelty",
    "evt_seasonal_strength_anova",
    "doc_token_budget_allocation",
    "geo_grid_dbscan",
    "tpch_q2_min_cost_supplier",
]

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    _CHECK_FIRST,
)


def test_first_50_match_staged_check_order():
    assert list(QUERIES)[:50] == _CHECK_FIRST[:50]
    assert _CHECK_FIRST[:3] == _R9_HEAD
    assert _CHECK_FIRST[:21] == _R9_STAGED_21


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
