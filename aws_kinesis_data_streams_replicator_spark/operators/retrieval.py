"""Ranked retrieval over the ``documents`` table: TF-IDF and BM25.

LLM-pipeline ops (not in the reference — SURVEY §2.2 extension): corpus
indexing and ranked search are how training pipelines mine for
high-quality or on-topic documents at scale (quality-classifier seed
sets, targeted decontamination, domain probes).

All scoring is **integer-exact**: the classic ``ln``-based idf is
replaced by its rational argument scaled to int64 (a strictly monotone
per-term surrogate), and the BM25 term saturation ``tf·(k1+1) /
(tf + k1·(1-b+b·dl/avgdl))`` is multiplied through by the corpus token
count so every division is a single integer floor-div.  Engines disagree
on the last ulp of ``ln``/double math; they cannot disagree on int64
arithmetic — which is what lets the DuckDB oracle hash-match.  At 100 TB
you would flip these expressions to plain doubles (1-ulp rank jitter is
irrelevant in production; the integer form exists for the parity gate).

Scale notes: the postings build is one explode + one map-side-combined
aggregation (shuffle on (doc_id, term)); document frequency is a second
small aggregation over the postings; corpus scalars (N, Σdl) are a
1-row aggregate joined back by broadcast — never a driver collect.  The
query-term filter lands BEFORE the df/score joins, so BM25's joins only
move postings rows matching the query (|q| terms × df rows, not the
whole index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import word_tokens
from .util import spread

IDF_SCALE = 1_000_000  # tfidf idf surrogate scale
BM25_IDF_SCALE = 1_000  # bm25 idf surrogate scale (keeps int64 headroom)


def term_postings(documents: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — the inverted-index fact table."""
    toks = spread(documents).select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by integer-scaled TF-IDF.

    score = tf · (N·IDF_SCALE div df); ties broken by term asc so the
    cut is total-order deterministic.
    """
    tf = term_postings(documents).localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n))
        .withColumn("score", F.expr("tf * ((n * 1000000) DIV df)"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "score", F.col("rnk").cast("long").alias("rnk"))
    )


def bm25_topk(
    documents: DataFrame, query_terms: list[str], k: int = 20
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under integer-exact BM25
    (k1 = 1.2, b = 0.75 — multiplied through as 6/5 and 3/4).

    Per matching (doc, term):
        idf_s = ((2N − 2·df + 1)·1000) div (2·df + 1)      # rational idf arg
        sat   = (44·tf·Σdl) div (20·tf·Σdl + 6·Σdl + 18·dl·N)
                # = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) ×20Σdl/20Σdl
        score = Σ_terms (idf_s · 44·tf·Σdl) div (20·tf·Σdl + 6·Σdl + 18·dl·N)

    Int64 headroom: idf_s ≤ 2N·10³, 44·tf·Σdl ≲ 10¹⁰ at the fixture
    scale — the product stays under 2⁶³.  The query-term filter is
    pushed to the postings before any join.
    """
    spark = documents.sparkSession
    # inline VALUES, not createDataFrame: a local-list DataFrame spawns a
    # Python worker per partition just to serve constants.
    values = ", ".join("('" + t.replace("'", "''") + "')" for t in query_terms)
    qdf = spark.sql(f"SELECT * FROM VALUES {values} AS q(term)")

    docs = spread(documents).select(
        "doc_id", word_tokens(F.col("text")).alias("toks")
    )
    dl = docs.select("doc_id", F.size("toks").cast("long").alias("dl"))
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qdf), "term")  # prune to query terms pre-shuffle
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return bm25_score_postings(tf, dl, k)


def bm25_score_postings(tf: DataFrame, dl: DataFrame, k: int = 20) -> DataFrame:
    """BM25 scoring tail over a PRE-BUILT inverted index: ``tf`` =
    (doc_id, term, tf) postings already pruned to the query terms,
    ``dl`` = (doc_id, dl) document lengths.  Same integer-exact math as
    ``bm25_topk`` (which delegates here) — factored out so a
    STREAMING-MAINTAINED index (streaming/job.py:
    streaming_retrieval_index_maintenance) serves queries through the
    identical scoring plan without touching raw text."""
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.expr(
                "(((2*n - 2*df + 1) * 1000) DIV (2*df + 1)) * (44*tf*sdl) "
                "DIV (20*tf*sdl + 6*sdl + 18*dl*n)"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    from pyspark.sql import Window

    # top-k FIRST via orderBy().limit (TakeOrderedAndProject: partial
    # per-partition top-k, no single-partition sort of every matched
    # doc), then rank only the k bounded survivors
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("long").alias("rnk")
    )


def hybrid_rrf_topk(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) + embedding top-k (semantic),
    fused by Reciprocal Rank Fusion — the standard RAG retrieval stack
    (Cormack et al., "Reciprocal rank fusion outperforms Condorcet").

    RRF score is integer-exact: ``Σ 10⁶ DIV (rrf_k + rank)`` over the
    lists containing the doc (a missing list contributes 0), so the
    fused ranking is engine-portable.  Final order: fused score desc,
    doc_id asc.

    Scale notes (100 TB): the two branch top-ks are the scale-bounded
    parts (BM25 joins move only query-term postings; the vector branch
    swaps to the LSH/IVF candidate paths of operators/similarity.py at
    corpus scale); the fusion itself joins two k_each-row lists — a
    broadcast-trivial full outer join whatever the corpus size.
    """
    from pyspark.sql import Window

    from .similarity import brute_force_topk

    text_rank = bm25_topk(documents, query_terms, k=k_each).select(
        "doc_id", F.col("rnk").alias("rnk_t")
    )
    qv = embeddings.where(F.col("vec_id") == query_vec_id)
    vec_rank = brute_force_topk(embeddings, qv, k=k_each).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rnk_v")
    )
    fused = text_rank.join(vec_rank, "doc_id", "full").select(
        "doc_id",
        (
            F.coalesce(F.expr(f"1000000 DIV ({rrf_k} + rnk_t)"), F.lit(0))
            + F.coalesce(F.expr(f"1000000 DIV ({rrf_k} + rnk_v)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    # the fused list is ≤ 2·k_each rows, but keep the scale-safe shape
    # anyway: limit first, then rank the bounded survivors
    top = fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "rrf_micro",
        F.row_number().over(w).cast("long").alias("rnk"),
    )


def bm25_topk_from_index(
    spark, index_dir: str, query_terms: list[str], k: int = 20
) -> DataFrame:
    """BM25 query served ENTIRELY from a maintained on-disk inverted
    index (postings + document lengths under ``index_dir``, as laid out
    by streaming/job.py:streaming_retrieval_index_maintenance) — raw
    text is never read at query time.  The term filter prunes the
    postings scan (pushed predicate on the ``term`` column), so query
    cost is proportional to the query terms' posting lists, not the
    corpus — the property that makes an inverted index an INDEX.

    Re-ingested documents (same doc_id in a later batch) are resolved
    LAST-WRITE-WINS here at query time: each doc's postings and length
    come from its highest batch_id, so N and Σdl never double-count an
    updated doc.  The winner join keys on doc_id — the doclen side is
    read anyway for scoring, so this costs one extra per-doc rollup,
    not a second corpus scan."""
    if not query_terms:
        # an interpolated empty VALUES list is malformed SQL; the right
        # answer for a no-term query is simply no hits
        return spark.createDataFrame(
            [], "doc_id long, score long, rnk long"
        )
    values = ", ".join("('" + t.replace("'", "''") + "')" for t in query_terms)
    qdf = spark.sql(f"SELECT * FROM VALUES {values} AS q(term)")
    doclen = spark.read.parquet(f"{index_dir}/doclen")
    latest = doclen.groupBy("doc_id").agg(
        F.max("batch_id").alias("batch_id")
    )
    tf = (
        spark.read.parquet(f"{index_dir}/postings")
        .join(F.broadcast(qdf), "term")
        .join(latest, ["doc_id", "batch_id"])
        .select("doc_id", "term", "tf")
    )
    dl = doclen.join(latest, ["doc_id", "batch_id"]).select("doc_id", "dl")
    return bm25_score_postings(tf, dl, k)


# round-12: ranking-quality evaluation (nDCG@k / MRR / P@k).  The
# discount 1/log2(i+1) is irrational, so (the repo's integer-exact
# doctrine) it enters as a FIXED micro-unit literal table shared with
# the oracle — round(1e6 / log2(i+1)) for ranks 1..10.  Engines cannot
# disagree on a literal.
NDCG_DISCOUNT_MICRO = [
    (1, 1_000_000),
    (2, 630_930),
    (3, 500_000),
    (4, 430_677),
    (5, 386_853),
    (6, 356_207),
    (7, 333_333),
    (8, 315_465),
    (9, 301_030),
    (10, 289_065),
]


def retrieval_ranking_eval(
    documents: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
) -> DataFrame:
    """Ranking-quality eval for BM25 over a fixed query set: one row
    per query with integer-exact nDCG@k, MRR and precision@k.

    Graded relevance is DERIVED, not annotated: rel(q, d) = number of
    distinct q-terms present in d (0..|q|) — the standard proxy when no
    human labels exist, and deterministic from the corpus so the DuckDB
    oracle replays it bit-for-bit.  Metrics (micro-units, all int64):

        dcg_micro  = Σ_{i≤k} rel_i · W[i]          (W = discount table)
        idcg_micro = same over the IDEAL ordering (rel desc, doc asc)
        ndcg_micro = dcg_micro · 10⁶ div idcg_micro
        mrr_micro  = 10⁶ div (first rank with rel > 0)
        p_at_k     = |{i ≤ k : rel_i > 0}|

    Scale notes: ONE corpus pass builds the postings for every query
    at once (the query-term broadcast filter prunes pre-shuffle, so
    joined rows = Σ_q posting lists, not |corpus|·|Q|); scoring is the
    shared bm25 integer tail; per-query ranking is a |Q|-partition
    window over only the MATCHED docs (family precedent:
    brute_force_topk), with the discount/metric folds on ≤k-row
    survivor sets.  The 1-row corpus-stats aggregate enters as the
    allowlisted scalar broadcast."""
    from pyspark.sql import Window

    spark = documents.sparkSession
    qvals = ", ".join(
        "('" + qid + "', '" + t.replace("'", "''") + "')"
        for qid, terms in queries
        for t in terms
    )
    qdf = spark.sql(f"SELECT * FROM VALUES {qvals} AS q(qid, term)")
    wvals = ", ".join(f"({i}, {w})" for i, w in NDCG_DISCOUNT_MICRO[:k])
    wdf = spark.sql(f"SELECT * FROM VALUES {wvals} AS w(rnk, disc_w)")

    docs = spread(documents).select(
        "doc_id", word_tokens(F.col("text")).alias("toks")
    )
    dl = docs.select("doc_id", F.size("toks").cast("long").alias("dl"))
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qdf), "term")
        .groupBy("qid", "doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("qid", "term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl"))
    scored = (
        tf.join(F.broadcast(df_), ["qid", "term"])
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.expr(
                "(((2*n - 2*df + 1) * 1000) DIV (2*df + 1)) * (44*tf*sdl) "
                "DIV (20*tf*sdl + 6*sdl + 18*dl*n)"
            ),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    # tf rows are unique per (qid, doc, term), so presence count IS the
    # distinct-term count — no distinct-agg rewrite needed
    rel = tf.groupBy("qid", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("rel")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        scored.withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= k)
        .join(rel, ["qid", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .join(F.broadcast(wdf), "rnk")
    )
    retrieved = ranked.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum(F.col("rel") * F.col("disc_w")).cast("long").alias("dcg_micro"),
        F.sum((F.col("rel") > 0).cast("long")).cast("long").alias("p_at_k"),
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("first_hit"),
    )
    wi = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        rel.withColumn("irnk", F.row_number().over(wi))
        .where(F.col("irnk") <= k)
        .join(F.broadcast(wdf), F.col("irnk") == F.col("rnk"))
        .groupBy("qid")
        .agg(F.sum(F.col("rel") * F.col("disc_w")).cast("long").alias("idcg_micro"))
    )
    return (
        retrieved.join(ideal, "qid")
        .select(
            "qid",
            "n_retrieved",
            "p_at_k",
            F.expr("coalesce(1000000 DIV first_hit, 0)")
            .cast("long")
            .alias("mrr_micro"),
            "dcg_micro",
            "idcg_micro",
            F.expr(
                "CASE WHEN idcg_micro > 0 "
                "THEN (dcg_micro * 1000000) DIV idcg_micro ELSE 0 END"
            )
            .cast("long")
            .alias("ndcg_micro"),
        )
        .orderBy("qid")
    )
