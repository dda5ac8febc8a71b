"""The driver's correctness gate checks the FIRST 50 registered queries,
so registration order is part of the contract.  Pin the round-8 window
(7 round-7 registrations that never saw a driver window, then the 14
queries whose plans were rewritten in round 8 — the global-window
family — then 29 staleness-refresh names whose last driver-green row
is oldest, r2-era): any refactor that silently reorders the registry
fails here before it costs a driver round.  Rotating the window is an
INTENTIONAL edit to both _CHECK_FIRST and this pin.

Staleness reconstruction recipe: for each CORRECTNESS_r0*.json in round
order, record the latest round where a query was fully green
(rows+schema+hash, no err); sort ascending by that round.  The r8
window consumed 29 of the 32 r2-era names; udf_pandas_agg_median,
udf_pandas_distinct_words, udtf_bigrams head the r9 refresh."""

from __future__ import annotations

# the round-8 window's first three names — a literal canary so a bad
# merge of the _CHECK_FIRST section fails loudly, not just consistently
_R8_HEAD = ["dq_record_linkage", "cdc_join_view_maintenance",
            "evt_selfjoin_size_estimate"]

# the 21 risk-ordered names at the r8 head (7 never-driver-checked r7
# registrations + 14 round-8 plan rewrites) — pinned as a block so a
# partial rotation (some staged names dropped) fails
_R8_STAGED_21 = [
    "dq_record_linkage",
    "cdc_join_view_maintenance",
    "evt_selfjoin_size_estimate",
    "cdc_join_view_zset_deletes",
    "agg_join_size_estimate",
    "dq_linkage_blocking_eval",
    "evt_count_min_deletes",
    "tpch_q10_returned_items",
    "evt_timeseries_similarity",
    "evt_user_rfm_segments",
    "part_abc_pareto",
    "text_vocab_coverage_curve",
    "text_zipf_curve",
    "evt_decile_lift_table",
    "text_classifier_calibration",
    "doc_bm25_search",
    "doc_hybrid_rrf",
    "text_bpe_merge_step",
    "text_bpe_apply",
    "text_bpe_encode_stats",
    "pipeline_corpus_curation_v5",
]

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    _CHECK_FIRST,
)


def test_first_50_match_staged_check_order():
    assert list(QUERIES)[:50] == _CHECK_FIRST[:50]
    assert _CHECK_FIRST[:3] == _R8_HEAD
    assert _CHECK_FIRST[:21] == _R8_STAGED_21


def test_check_first_has_no_dupes_or_stale_names():
    assert len(_CHECK_FIRST) == len(set(_CHECK_FIRST))
    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    assert missing == []


def test_every_query_has_an_oracle():
    assert sorted(set(QUERIES) - set(ORACLE_SQL)) == []
