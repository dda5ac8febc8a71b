"""The driver's correctness gate checks the FIRST 50 registered queries,
so registration order is part of the contract.  Pin the round-12 window
(queries NEW in round 12 first, then the 4 r4-era staleness stragglers
the r11 window could not hold, then the 45-name r5 era): any refactor
that silently reorders the registry fails here before it costs a
driver round.  Rotating the window is an INTENTIONAL edit to both
_CHECK_FIRST and this pin.

Staleness reconstruction recipe: for each CORRECTNESS_r0*.json in round
order, record the latest round where a query was fully green
(rows+schema+hash, no err); sort ascending by that round, alphabetical
within a round.  The r11 window came back 50/50 green, so after it the
ladder is r4×4 (part_cooccurrence_pairs leads — the name the r11
staging notes omitted; the artifact rebuild caught it, again), r5×45,
r6×44, r7×47, r8-r11×50 each.  Always rebuild from the artifacts, not
the prose."""

from __future__ import annotations

# the round-12 window's first three names — a literal canary so a bad
# merge of the _CHECK_FIRST section fails loudly, not just consistently
_R12_HEAD = [
    "doc_retrieval_ranking_eval",
    "pipeline_publication_audit",
    "doc_dedup_keep_best",
]

# the risk-ordered block at the r12 head: every query NEW in round 12
# (PREPEND those at registration time) + the 4 r4-era stragglers —
# pinned as a block so a partial rotation fails.
_R12_STAGED = _R12_HEAD + [
    "join_salted_skew_rollup",
    "emb_cluster_mixture_report",
    "part_cooccurrence_pairs",
    "pipeline_corpus_curation_v4",
    "text_classifier_histogram",
    "text_quality_classifier",
]

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    _CHECK_FIRST,
)


def test_first_50_match_staged_check_order():
    assert list(QUERIES)[:50] == _CHECK_FIRST[:50]
    assert _CHECK_FIRST[:3] == _R12_HEAD
    assert _CHECK_FIRST[: len(_R12_STAGED)] == _R12_STAGED


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
