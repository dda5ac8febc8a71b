"""The driver's correctness gate checks the FIRST 50 registered queries,
so registration order is part of the contract.  Pin the round-7 window
(15 staged r7-head names — 4 hint-removal TPC-H + re-codec'd
mm_feature_extract + 10 late-round-6 registrations — then 35
staleness-refresh names whose last driver-green row is oldest): any
refactor that silently reorders the registry fails here before it
costs a driver round.  Rotating the window is an INTENTIONAL edit to
both _CHECK_FIRST and this pin."""

from __future__ import annotations

# the round-7 window's first three names — a literal canary so a bad
# merge of the _CHECK_FIRST section fails loudly, not just consistently
_R7_HEAD = ["tpch_q3_top_orders", "tpch_q14_promo_revenue",
            "tpch_q18_large_orders"]

# the 15 names staged for the r7 head in NOTES_r7_staging.md — pinned
# as a block so a partial rotation (some staged names dropped) fails
_R7_STAGED_15 = [
    "tpch_q3_top_orders",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_bracket_revenue",
    "mm_feature_extract",
    "doc_chargram_dup_coverage",
    "doc_url_canonical_dedup",
    "text_bpe_apply",
    "agg_quantile_sketch_merge",
    "text_bpe_encode_stats",
    "text_heavy_hitters_bounds",
    "doc_url_host_profile",
    "text_count_min_estimate",
    "text_bloom_membership",
    "pipeline_corpus_curation_v5",
]

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    _CHECK_FIRST,
)


def test_first_50_match_staged_check_order():
    assert list(QUERIES)[:50] == _CHECK_FIRST[:50]
    assert _CHECK_FIRST[:3] == _R7_HEAD
    assert _CHECK_FIRST[:15] == _R7_STAGED_15


def test_check_first_has_no_dupes_or_stale_names():
    assert len(_CHECK_FIRST) == len(set(_CHECK_FIRST))
    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    assert missing == []


def test_every_query_has_an_oracle():
    assert sorted(set(QUERIES) - set(ORACLE_SQL)) == []
