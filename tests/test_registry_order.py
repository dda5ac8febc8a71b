"""The driver's correctness gate checks the FIRST 50 registered queries,
so registration order is part of the contract.  Pin the round-6 window
(2 r5-changed + 37-name backlog + 11 hint-removal queries): any
refactor that silently reorders the registry fails here before it
costs a driver round.  Rotating the window is an INTENTIONAL edit to
both _CHECK_FIRST and this pin."""

from __future__ import annotations

# the round-6 window's first three names — a literal canary so a bad
# merge of the _CHECK_FIRST section fails loudly, not just consistently
_R6_HEAD = ["doc_neardup_rate_by_source", "text_bpe_pair_counts",
            "graph_degree_histogram"]

from aws_kinesis_data_streams_replicator_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    _CHECK_FIRST,
)


def test_first_50_match_staged_check_order():
    assert list(QUERIES)[:50] == _CHECK_FIRST[:50]
    assert _CHECK_FIRST[:3] == _R6_HEAD


def test_check_first_has_no_dupes_or_stale_names():
    assert len(_CHECK_FIRST) == len(set(_CHECK_FIRST))
    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    assert missing == []


def test_every_query_has_an_oracle():
    assert sorted(set(QUERIES) - set(ORACLE_SQL)) == []
