"""Scale-path near-dup contracts.

1. The banded sign-LSH + exact-verify embedding near-dup path must emit
   EXACTLY the brute-force pairs on a fixture with planted near-dups
   (candidate recall 1.0 at the registered threshold, then exact verify).
2. The hot-shingle document-frequency cap must bound every posting list
   while keeping genuine near-dup pairs alive.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import dedup

MIN_DOT_Q = 950_000_000_000  # cos 0.95 for unit vectors quantized at 1e6


def _planted_embeddings_df(spark):
    """60 unit vectors: 40 random (pairwise cos < 0.6 w.h.p.) + 10 tight
    dups of the first 10 (cos ≈ 0.99) + 10 looser dups of the next 10
    (cos ≈ 0.97) — deterministic seed, inline VALUES (no Python workers)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    tight = base[:10] + 0.02 * rng.normal(size=(10, 64))
    loose = base[10:20] + 0.03 * rng.normal(size=(10, 64))
    allv = np.vstack([base, tight, loose])
    allv /= np.linalg.norm(allv, axis=1, keepdims=True)
    rows = ", ".join(
        f"({i}, CAST(array({', '.join(f'{x:.6f}' for x in v)}) AS ARRAY<FLOAT>))"
        for i, v in enumerate(allv)
    )
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(vec_id, embedding)")


def test_lsh_neardup_equals_brute_force_on_planted_dups(spark):
    emb = _planted_embeddings_df(spark)
    bf = sorted(
        tuple(r)
        for r in dedup.embedding_neardup_pairs(emb, min_dot_q=MIN_DOT_Q).collect()
    )
    lsh = sorted(
        tuple(r)
        for r in dedup.embedding_neardup_pairs_lsh(emb, min_dot_q=MIN_DOT_Q).collect()
    )
    assert len(bf) >= 20  # the 20 planted pairs are all above threshold
    assert lsh == bf


def test_lsh_neardup_plan_is_bucket_equi_join(spark):
    """The registered near-dup plan must be a shuffle/broadcast HASH join
    on the (band, bucket) key — never a nested-loop over all pairs."""
    emb = _planted_embeddings_df(spark)
    plan = (
        dedup.embedding_neardup_pairs_lsh(emb, min_dot_q=MIN_DOT_Q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _skewed_docs_df(spark):
    """12 docs that all share one hot stop-phrase; docs 10/11 are genuine
    near-dups of each other beyond it."""
    hot = "click here to subscribe now"
    uniq = [
        f"document {i} body alpha{i} beta{i} gamma{i} delta{i} epsilon{i} "
        f"zeta{i} eta{i} theta{i} {hot}"
        for i in range(10)
    ]
    dup_a = f"the quick brown fox jumps over the lazy dog again and again {hot}"
    dup_b = f"the quick brown fox jumps over the lazy dog again and once {hot}"
    rows = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(uniq + [dup_a, dup_b])
    )
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(doc_id, text)")


def test_hot_shingle_cap_bounds_posting_lists_and_keeps_true_dups(spark):
    docs = _skewed_docs_df(spark)
    capped = dedup.ngram_jaccard_pairs(
        docs, k_shingle=3, threshold=0.1, max_shingle_df=5
    )
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (10, 11) in pairs  # genuine near-dup survives the cap
    # no pair whose only evidence is the hot phrase
    assert all(a >= 10 for a, _b in pairs)
    # posting lists really are bounded after the cap
    from aws_kinesis_data_streams_replicator_spark.functions.hashing import (
        shingles_of_tokens,
        word_tokens,
    )

    sh = (
        docs.select(
            "doc_id",
            F.explode(shingles_of_tokens(word_tokens(F.col("text")), 3)).alias(
                "shingle"
            ),
        )
        .dropDuplicates(["doc_id", "shingle"])
        .groupBy("shingle")
        .count()
    )
    assert sh.agg(F.max("count")).first()[0] > 5  # fixture IS skewed


def test_pandas_buckets_equal_jvm_buckets(spark, sf_dir):
    """The numpy-matmul bucket path must be bit-identical to the JVM
    sign_lsh_bucket expression family it replaced."""
    from pyspark.sql import functions as F

    from aws_kinesis_data_streams_replicator_spark.functions.vectors import (
        quantize_embedding,
    )
    from aws_kinesis_data_streams_replicator_spark.operators.similarity import (
        sign_lsh_bucket,
    )
    from aws_kinesis_data_streams_replicator_spark.operators.udfs import (
        sign_lsh_all_bands_udf,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    q = emb.select("vec_id", quantize_embedding(F.col("embedding")).alias("qe"))
    jvm = q.select(
        "vec_id",
        *[
            sign_lsh_bucket(F.col("qe"), 8, 64, plane_offset=b * 8).alias(f"b{b}")
            for b in range(4)
        ],
    )
    pdu = q.select(
        "vec_id", sign_lsh_all_bands_udf(4, 8, 64)(F.col("qe")).alias("bs")
    )
    want = {r.vec_id: [r.b0, r.b1, r.b2, r.b3] for r in jvm.collect()}
    got = {r.vec_id: list(r.bs) for r in pdu.collect()}
    assert got == want
