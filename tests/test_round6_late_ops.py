"""Round-6 late-window operators (the staged r7 candidates from
NOTES_r7_staging.md): character-gram duplication coverage, URL
canonicalization, BPE apply — hand-computed small cases (fixture-scale
equivalence is covered by the oracle parity suite)."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    chargram_dup_coverage,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chargram_coverage_exact_interval_union(spark):
    # k=4, stride=2.  Docs 1 and 2 share the 10-char prefix
    # "abcdefghij"; doc 3 is disjoint.
    shared = "abcdefghij"
    rows = [
        (1, shared + "111111"),  # 16 chars
        (2, shared + "222222"),  # 16 chars
        (3, "zzzzzzzzzzzzzzzz"),  # 16 chars, all-equal grams WITHIN doc
    ]
    got = {
        r.doc_id: r
        for r in chargram_dup_coverage(
            _docs(spark, rows), k_chars=4, stride=2
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    # positions 1,3,5,7,9,11,13 (len 16 → last pos 13); duplicated grams
    # between docs 1/2 are the windows fully inside the 10-char prefix:
    # pos 1,3,5,7 (pos 7 covers chars 7-10).  Interval union:
    # 4 + 2 + 2 + 2 = 10 chars — exactly the shared prefix.
    for d in (1, 2):
        r = got[d]
        assert r.n_grams == 7
        assert r.n_dup_grams == 4
        assert r.covered_chars == 10
        assert r.dup_cover_bp == 10 * 10000 // 16
    # doc 3's grams repeat WITHIN the doc but exist in no other doc —
    # document frequency is distinct-doc based, so nothing is flagged
    r3 = got[3]
    assert (r3.n_dup_grams, r3.covered_chars, r3.dup_cover_bp) == (0, 0, 0)


def test_chargram_coverage_skips_short_docs(spark):
    rows = [(1, "abc"), (2, "abcdefghijklmnopqrstuvwxyz")]
    got = chargram_dup_coverage(_docs(spark, rows), k_chars=20, stride=4)
    assert [r.doc_id for r in got.collect()] == [2]


def test_bpe_apply_matches_hand_computed_merges(spark):
    from aws_kinesis_data_streams_replicator_spark.operators.text import (
        bpe_apply,
    )

    docs = spark.sql(
        "SELECT * FROM VALUES (1, 'low low low lower lowest'), "
        "(2, 'new newer newest low') AS t(doc_id, text)"
    )
    got = [
        (r.token, r.n_tokens, r.token_rank)
        for r in bpe_apply(docs, n_merges=3, top_k=10).collect()
    ]
    # merges: (l,o) → (lo,w) [a SECOND-ORDER merge consuming the first
    # sentinel] → (e,w); remaining symbol inventory hand-computed
    assert got == [
        ("low", 6, 1),
        ("e", 4, 2),
        ("ew", 3, 3),
        ("n", 3, 4),
        ("r", 2, 5),
        ("s", 2, 6),
        ("t", 2, 7),
    ]


def test_bpe_encode_stats_hand_computed(spark):
    from aws_kinesis_data_streams_replicator_spark.operators.text import (
        bpe_encode_stats,
    )

    docs = spark.sql(
        "SELECT * FROM VALUES (1, 'low low low lower lowest'), "
        "(2, 'new newer newest low') AS t(doc_id, text)"
    )
    got = {
        r.doc_id: r for r in bpe_encode_stats(docs, n_merges=3).collect()
    }
    # merges (l,o)(lo,w)(e,w): low=1 tok, lower=3, lowest=4, new=2,
    # newer=4, newest=5
    r1 = got[1]
    assert (r1.n_words, r1.n_word_chars, r1.n_bpe_tokens) == (5, 20, 10)
    assert r1.tokens_per_100_chars == 50
    r2 = got[2]
    assert (r2.n_words, r2.n_word_chars, r2.n_bpe_tokens) == (4, 17, 12)
    assert r2.tokens_per_100_chars == 70


def test_quantile_sketch_merge_exact_when_uncompressed(spark, sf_dir):
    """With n_s ≤ 32 per shard, the equi-depth summary keeps EVERY
    value (no compression), so the merged-sketch estimate must equal
    the exact rank-select — the zero-error degenerate case that pins
    the boundary/weight/merge arithmetic."""
    from aws_kinesis_data_streams_replicator_spark.plans.queries import (
        QUERIES,
    )

    out = QUERIES["agg_quantile_sketch_merge"](spark, sf_dir)
    rows = out.collect()
    assert rows, "expected one row per event type"
    for r in rows:
        assert r.within_p25 and r.within_p50 and r.within_p75, r
        # estimates bracket exact by the proven bound in VALUE rank
        # terms; at fixture scale they should also be close in cents
        assert r.est_p50_cents >= r.exact_p25_cents, r
        assert r.est_p50_cents <= r.exact_p75_cents, r
    # degenerate exactness: tiny per-shard inputs are kept verbatim
    tiny = spark.sql(
        "SELECT 'a' AS event_type, CAST(i AS BIGINT) AS event_id, "
        "CAST(i AS DOUBLE) / 100 AS value, "
        "TIMESTAMP '2024-01-01 00:00:00' AS ts, '{}' AS props "
        "FROM range(1, 33) AS t(i)"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tiny.write.parquet(d + "/events.parquet")
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ]:
            spark.read.parquet(sf_dir + f"/{t}.parquet").limit(1).write.parquet(
                d + f"/{t}.parquet"
            )
        got = {
            r.event_type: r
            for r in QUERIES["agg_quantile_sketch_merge"](spark, d).collect()
        }
    r = got["a"]
    # values are cents 1..32: exact p25/50/75 at ceil(p·32) = 8/16/24
    assert (r.exact_p25_cents, r.exact_p50_cents, r.exact_p75_cents) == (
        8, 16, 24,
    )
    # 2 values per shard ⇒ no compression ⇒ estimates exact
    assert (r.est_p25_cents, r.est_p50_cents, r.est_p75_cents) == (8, 16, 24)


def test_heavy_hitters_bounds_with_truncation(spark):
    """capacity=2 forces real truncation: bounds must bracket exact
    counts, be TIGHT for words kept in every shard, and words absent
    from every shard summary fall out of the candidate set."""
    from aws_kinesis_data_streams_replicator_spark.operators.text import (
        heavy_hitters_bounds,
    )

    docs = spark.sql(
        "SELECT * FROM VALUES (0, 'a a a b b c'), (1, 'a a c c c d') "
        "AS t(doc_id, text)"
    )
    got = {
        r.word: r
        for r in heavy_hitters_bounds(
            docs, n_shards=2, capacity=2, top_n=4
        ).collect()
    }
    # shard0 keeps a(3) b(2), eps=1 (c); shard1 keeps c(3) a(2), eps=1
    # (d); total_eps=2.  Exact: a5 c4 b2 d1.
    assert set(got) == {"a", "c", "b"}  # d truncated everywhere → absent
    a, c, b = got["a"], got["c"], got["b"]
    assert (a.lower_bound, a.upper_bound, a.exact_n) == (5, 5, 5)  # tight
    assert (c.lower_bound, c.upper_bound, c.exact_n) == (3, 4, 4)
    assert (b.lower_bound, b.upper_bound, b.exact_n) == (2, 3, 2)
    assert all(r.bounds_hold for r in got.values())


def test_canonical_url_rules(spark):
    from pyspark.sql import functions as F

    from aws_kinesis_data_streams_replicator_spark.functions.url import (
        canonical_url,
    )

    cases = [
        # scheme/host case, default port, trailing slash, utm, order, frag
        (
            "HTTP://CDN0.Example.COM:80/p/0/?id=0&utm_source=feed&ref=0#frag",
            "http://cdn0.example.com/p/0?id=0&ref=0",
        ),
        # :80 on https is a REAL port — kept; params re-sorted
        (
            "https://cdn1.example.com:80/p/1?ref=1&id=1&utm_campaign=x",
            "https://cdn1.example.com:80/p/1?id=1&ref=1",
        ),
        # :443 on https is default — stripped
        (
            "https://cdn1.example.com:443/p/1?id=1&ref=1",
            "https://cdn1.example.com/p/1?id=1&ref=1",
        ),
        # empty path → '/', query emptied by utm filter → dropped
        ("http://a.com", "http://a.com/"),
        ("http://a.com/?utm_source=x", "http://a.com/"),
        ("not a url", None),
    ]
    df = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{u}')" for u, _ in cases)
        + " AS t(u)"
    )
    got = [
        r.c
        for r in df.select(canonical_url(F.col("u")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]
