"""Property checks for the late-round-6 operators.

Two kinds: pure-Python hypothesis properties for the equi-depth
compaction rule (fast, hundreds of examples), and one-shot seeded
randomized corpora pushed through Spark in a single call with the
result checked against an independent brute-force reference — the
batched form of a property test that keeps the JVM round-trip count at
one."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    _eqd_merge_and_median,
)


# ---------------------------------------------------------------------------
# equi-depth compaction: est median within a provable rank window
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-5000, max_value=5000), min_size=1,
             max_size=400),
    st.integers(min_value=2, max_value=40),
)
def test_eqd_single_compaction_median_bound(values, n_batches):
    """Feed a random multiset in random batch splits through the
    summary; the final median estimate's EXACT rank must sit within
    the accumulated error budget of the target rank."""
    rng = random.Random(1234)
    vals = list(values)
    rng.shuffle(vals)
    pts: dict[int, int] = {}
    err_total = 0
    # split into n_batches contiguous chunks (some possibly empty)
    cuts = sorted(rng.randint(0, len(vals)) for _ in range(n_batches - 1))
    chunks, prev = [], 0
    for c in cuts + [len(vals)]:
        chunks.append(vals[prev:c])
        prev = c
    est = None
    for chunk in chunks:
        for v in chunk:
            pts[v] = pts.get(v, 0) + 1
        srt, err_inc, est = _eqd_merge_and_median(pts, C=8)
        err_total += err_inc
        pts = dict(srt)
        assert len(srt) <= 8
    assert est is not None
    n = len(vals)
    target = -(-n // 2)  # ceil(n/2)
    s = sorted(vals)
    rank_lo = sum(1 for v in s if v < est) + 1  # first rank est occupies
    rank_hi = sum(1 for v in s if v <= est)  # last rank est occupies
    # est is a REAL data value whose rank interval must overlap
    # [target - err, target + err]
    assert rank_lo - err_total <= target <= rank_hi + err_total


# ---------------------------------------------------------------------------
# chargram coverage: Spark vs brute-force reference on a random corpus
# ---------------------------------------------------------------------------


def _chargram_reference(docs, k, stride, min_docs=2):
    """Independent O(n·len) reference of the chargram-coverage
    definition: strided gram positions, corpus doc-frequency, per-doc
    interval union."""
    grams = {}  # gram -> set(doc_id)
    positions = {}  # doc_id -> [(pos, gram)]
    for doc_id, text in docs:
        if len(text) < k:
            continue
        plist = []
        for pos in range(1, len(text) - k + 2, stride):
            g = text[pos - 1 : pos - 1 + k]
            plist.append((pos, g))
            grams.setdefault(g, set()).add(doc_id)
        positions[doc_id] = plist
    out = {}
    for doc_id, text in docs:
        if doc_id not in positions:
            continue
        plist = positions[doc_id]
        dup_pos = [p for p, g in plist if len(grams[g]) >= min_docs]
        covered = 0
        prev = None
        for p in dup_pos:
            covered += k if prev is None else min(k, p - prev)
            prev = p
        out[doc_id] = (
            len(text),
            len(plist),
            len(dup_pos),
            covered,
            covered * 10000 // len(text),
        )
    return out


def test_chargram_coverage_matches_bruteforce_on_random_corpus(spark):
    from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
        chargram_dup_coverage,
    )

    rng = random.Random(99)
    # random docs over a tiny alphabet so k=6 grams genuinely repeat
    # across documents; a shared boilerplate string is planted in a
    # random third of them at random offsets
    boiler = "abcabcabcabc"
    docs = []
    for i in range(60):
        n = rng.randint(3, 40)
        t = "".join(rng.choice("abcd") for _ in range(n))
        if rng.random() < 0.33:
            at = rng.randint(0, len(t))
            t = t[:at] + boiler + t[at:]
        docs.append((i, t))
    values = ", ".join(f"({i}, '{t}')" for i, t in docs)
    df = spark.sql(f"SELECT * FROM VALUES {values} AS t(doc_id, text)")
    got = {
        r.doc_id: (
            r.n_chars,
            r.n_grams,
            r.n_dup_grams,
            r.covered_chars,
            r.dup_cover_bp,
        )
        for r in chargram_dup_coverage(df, k_chars=6, stride=2).collect()
    }
    want = _chargram_reference(docs, k=6, stride=2)
    assert got == want


# ---------------------------------------------------------------------------
# heavy hitters: bracket property on a random Zipf-ish corpus
# ---------------------------------------------------------------------------


def test_heavy_hitters_bounds_bracket_on_random_corpus(spark):
    from aws_kinesis_data_streams_replicator_spark.operators.text import (
        heavy_hitters_bounds,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(120)]
    docs = []
    for i in range(40):
        # Zipf-ish: low-index words much more frequent
        words = [
            vocab[min(int(rng.paretovariate(1.2)) - 1, 119)]
            for _ in range(rng.randint(5, 60))
        ]
        docs.append((i, " ".join(words)))
    values = ", ".join(f"({i}, '{t}')" for i, t in docs)
    df = spark.sql(f"SELECT * FROM VALUES {values} AS t(doc_id, text)")
    rows = heavy_hitters_bounds(
        df, n_shards=4, capacity=8, top_n=10
    ).collect()
    assert rows, "top words must survive truncation at this skew"
    # exact counts recomputed independently
    from collections import Counter

    exact = Counter(w for _, t in docs for w in t.split(" ") if w)
    for r in rows:
        assert r.exact_n == exact[r.word]
        assert r.lower_bound <= r.exact_n <= r.upper_bound, r
        assert r.bounds_hold
    # capacity 8 over ~120-word vocab: truncation must actually occur,
    # so at least one bound is slack (upper > lower)
    assert any(r.upper_bound > r.lower_bound for r in rows)


# ---------------------------------------------------------------------------
# URL canonicalization: idempotence over randomized messy URLs
# ---------------------------------------------------------------------------


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): the canonical form must
    be a fixed point, else two passes over the same crawl produce
    different dedup keys."""
    from pyspark.sql import functions as F

    from aws_kinesis_data_streams_replicator_spark.functions.url import (
        canonical_url,
    )

    rng = random.Random(42)
    urls = []
    for _ in range(200):
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS", "Http"])
        host = rng.choice(["A.b.C", "www.Example.COM", "cdn9.site.org"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/x", "/x/y", "/x/y/"])
        qs = rng.choice(
            [
                "",
                "?b=2&a=1",
                "?utm_source=x",
                "?a=1&utm_campaign=c&b=2",
                "?z=9&utm_medium=m",
            ]
        )
        frag = rng.choice(["", "#f"])
        urls.append(f"{scheme}://{host}{port}{path}{qs}{frag}")
    df = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{u}')" for u in urls)
        + " AS t(u)"
    )
    rows = df.select(
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(canonical_url(F.col("u"))).alias("c2"),
    ).collect()
    assert all(r.c1 == r.c2 for r in rows)
    assert all(r.c1 is not None for r in rows)
