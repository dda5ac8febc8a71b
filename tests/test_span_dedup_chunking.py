"""Span-level dedup, sliding-window chunking, per-group capping.

Covers operators/dedup.py:duplicate_spans + span_dup_fraction,
operators/text.py:chunk_documents, operators/sampling.py:cap_per_group
on hand-built fixtures with known answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    duplicate_spans,
    span_dup_fraction,
)
from aws_kinesis_data_streams_replicator_spark.operators.sampling import (
    cap_per_group,
)
from aws_kinesis_data_streams_replicator_spark.operators.text import (
    chunk_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "this page is licensed under the creative commons attribution license"


def test_duplicate_spans_finds_shared_boilerplate(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + BOILER),
            (2, BOILER + " gamma delta"),
            (3, "totally unrelated words with no overlap at all here now ok"),
        ],
    )
    out = duplicate_spans(docs, k_tokens=8, min_docs=2).collect()
    # BOILER is 10 tokens -> 3 overlapping 8-token windows per containing
    # doc; all 3 appear in docs 1 and 2, none in doc 3.
    assert len(out) == 3
    for r in out:
        assert r.n_docs == 2
        assert r.n_occurrences == 2
        assert r.first_doc == 1


def test_duplicate_spans_within_doc_repeat_counts_occurrences(spark):
    eight = "a b c d e f g h"
    docs = _docs(spark, [(1, eight + " " + eight + " " + eight)])
    # One doc repeating the same 8 tokens: n_docs stays 1 -> filtered out
    assert duplicate_spans(docs, k_tokens=8, min_docs=2).count() == 0
    docs2 = _docs(spark, [(1, eight + " x " + eight), (2, eight)])
    rows = {
        r.span_hash: r
        for r in duplicate_spans(docs2, k_tokens=8, min_docs=2).collect()
    }
    # The exact 8-token span occurs twice in doc 1 and once in doc 2.
    exact = [r for r in rows.values() if r.n_occurrences == 3]
    assert len(exact) == 1 and exact[0].n_docs == 2


def test_span_dup_fraction_values(spark):
    docs = _docs(
        spark,
        [
            (1, BOILER),  # 10 tokens -> 3 spans, all shared with doc 2
            (2, BOILER + " unique tail words here"),
            (3, "one two three four five six seven eight nine ten"),
        ],
    )
    got = {r.doc_id: r for r in span_dup_fraction(docs, k_tokens=8).collect()}
    assert got[1].n_spans == 3 and got[1].n_dup == 3
    assert got[1].dup_milli == 1000
    assert got[3].n_dup == 0 and got[3].dup_milli == 0
    # doc 2 has 14 tokens -> 7 spans; the first 3 are the BOILER spans.
    assert got[2].n_spans == 7 and got[2].n_dup == 3
    assert got[2].dup_milli == (3 * 1000) // 7


def test_chunk_documents_shapes_and_determinism(spark):
    text = " ".join(f"w{i}" for i in range(100))
    docs = _docs(spark, [(7, text)])
    rows = sorted(
        chunk_documents(docs, chunk_tokens=64, stride=32).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts at 1, 33, 65, 97 -> sizes 64, 64, 36, 4
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert [r.n_tokens for r in rows] == [64, 64, 36, 4]
    # consecutive chunks overlap by chunk_tokens - stride = 32 tokens;
    # identity is pure-function-of-input: re-run yields identical hashes
    again = sorted(
        chunk_documents(docs, chunk_tokens=64, stride=32).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_hash for r in rows] == [r.chunk_hash for r in again]


def test_chunk_documents_short_doc_single_chunk(spark):
    docs = _docs(spark, [(1, "just five little words here")])
    rows = chunk_documents(docs, chunk_tokens=64, stride=32).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0 and rows[0].n_tokens == 5


def test_cap_per_group_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 8 else "small", 100 if i < 6 else 50) for i in range(10)],
        "doc_id long, source string, n_chars long",
    )
    out = cap_per_group(
        df, group_col="source", order_col="n_chars", id_col="doc_id", cap=3
    )
    got = sorted(
        (r.source, r.doc_id, r.group_rank) for r in out.collect()
    )
    # "big": six 100-char docs (ids 0-5) -> ties broken by doc_id asc.
    assert [g for g in got if g[0] == "big"] == [
        ("big", 0, 1),
        ("big", 1, 2),
        ("big", 2, 3),
    ]
    # "small": only 2 docs, both kept.
    assert len([g for g in got if g[0] == "small"]) == 2


def test_cap_per_group_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, "a", 10)], "doc_id long, source string, n_chars long"
    )
    plan = cap_per_group(
        df, group_col="source", order_col="n_chars", id_col="doc_id", cap=3
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
