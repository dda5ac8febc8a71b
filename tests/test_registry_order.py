"""The driver's correctness gate checks the FIRST 50 registered queries,
so registration order is part of the contract.  Pin the round-11 window
(the 3 late-r10 registrations that never saw a driver window, then the
queries NEW in round 11, then the r4-era staleness cohort): any
refactor that silently reorders the registry fails here before it
costs a driver round.  Rotating the window is an INTENTIONAL edit to
both _CHECK_FIRST and this pin.

Staleness reconstruction recipe: for each CORRECTNESS_r0*.json in round
order, record the latest round where a query was fully green
(rows+schema+hash, no err); sort ascending by that round.  After the
r10 window the r3 era is exhausted; the 46 r4-era names head the r11
refresh (agg_approx_distinct / agg_approx_percentile /
agg_countif_maxby lead it, alphabetical within the round).  Always
rebuild from the artifacts, not the prose — the r10 rebuild caught a
stale name in the staging notes."""

from __future__ import annotations

# the round-11 window's first three names — a literal canary so a bad
# merge of the _CHECK_FIRST section fails loudly, not just consistently
_R11_HEAD = [
    "evt_incident_session_overlap",
    "evt_sliding_value_quantiles",
    "files_overlap_depth",
]

# the risk-ordered block at the r11 head: the 3 never-driver-checked
# late-r10 registrations + every query NEW in round 11 — pinned as a
# block so a partial rotation (some staged names dropped) fails.
# EXTEND this list when registering a new query this round.
_R11_STAGED = _R11_HEAD + [
    "evt_sliding_loghist_quantiles",
    "cdc_corpus_refresh_delta",
    "evt_type_value_profile",
    "agg_kmv_set_operations",
    "text_kneser_ney_bigrams",
]

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    _CHECK_FIRST,
)


def test_first_50_match_staged_check_order():
    assert list(QUERIES)[:50] == _CHECK_FIRST[:50]
    assert _CHECK_FIRST[:3] == _R11_HEAD
    assert _CHECK_FIRST[: len(_R11_STAGED)] == _R11_STAGED


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
