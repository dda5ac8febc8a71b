"""Text-analysis operators over the ``documents`` table.

LLM-pipeline text ops (not in the reference — SURVEY §2.2 extension):
quality stats, token counting (whitespace + BPE-ish regex), heuristic
language ID, and document fingerprinting.  All pure built-in column
expressions (whole-stage codegen, zero Python), all integer/string
arithmetic so the DuckDB oracle matches exactly.

Scale notes: per-row narrow ops — no shuffle except the final group-bys,
which aggregate map-side first.  At 100 TB the only care is regex cost:
the BPE-ish pattern is linear-scan, no backtracking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import md5_seeded, shingles_of_tokens, word_tokens
from .util import spread

# Tokens: runs of lowercase letters, runs of digits, or single other
# non-space chars — a deterministic BPE-ish pre-tokenizer, same regex
# semantics in Spark (Java regex) and DuckDB (RE2) for this pattern.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Marker words for the n-gram-heuristic language ID.  The fixture text is
# synthetic so the interesting property is determinism, not linguistics.
LANG_MARKERS = {
    "en": "the",
    "es": "data",
    "de": "spark",
    "fr": "table",
    "zh": "query",
}


def n_words(text: Column) -> Column:
    return F.size(word_tokens(text))


def quality_stats(documents: DataFrame) -> DataFrame:
    """Per-doc integer quality features + a CASE-based quality label."""
    toks = word_tokens(F.col("text"))
    df = spread(documents).select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_m"),
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_distinct_words"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 6)).alias("n_long_words"),
    )
    return df.withColumn(
        "quality_label",
        F.when(F.col("n_words") < 20, F.lit("too_short"))
        .when(F.col("n_distinct_words") * 4 < F.col("n_words"), F.lit("repetitive"))
        .otherwise(F.lit("ok")),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per source (corpus sizing)."""
    return (
        spread(documents).select(
            "source",
            F.size(word_tokens(F.col("text"))).alias("ws"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), 0)).alias(
                "bpe"
            ),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
        )
    )


def _marker_count(text: Column, marker: str) -> Column:
    # occurrences = (len - len(remove(marker))) / len(marker); exact ints.
    return (
        F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))
    ) / F.lit(len(marker))


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic marker-count argmax language ID (deterministic tie-break
    by language code)."""
    df = documents.select(
        "doc_id",
        "lang",
        *[
            _marker_count(F.col("text"), m).cast("long").alias(f"s_{lang}")
            for lang, m in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_MARKERS])
    pred = F.lit(None).cast("string")
    # argmax with lexicographic-smallest-language tie-break: walk langs in
    # sorted order, keep the first that attains the max.
    expr = None
    for lang in sorted(LANG_MARKERS):
        cond = F.col(f"s_{lang}") == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    pred = expr.otherwise(F.lit("und"))
    return df.select("doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang"))


def fingerprints(documents: DataFrame, k_shingle: int = 3) -> DataFrame:
    """Rolling-hash document fingerprint: lexicographic-min seeded md5
    over k-word shingles (winnowing with window = whole doc) + shingle
    count.  Equal fingerprints ⇒ near-identical prefixes of content."""
    # Explode + groupBy-min rather than array_min(transform(...)): the
    # nested higher-order expression gets re-evaluated per reference
    # (no common-subexpression reuse) and is ~10× slower; the exploded
    # form is one codegen'd pass + a map-side-combined aggregation.
    sh = (
        spread(documents)
        .select("doc_id", word_tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(shingles_of_tokens(F.col("toks"), k_shingle)).alias("shingle"),
        )
    )
    return sh.groupBy("doc_id").agg(
        F.min(md5_seeded(F.col("shingle"), 0)).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_shingles"),
    )


def vocab_oov(documents: DataFrame, min_df: int = 5) -> DataFrame:
    """Vocabulary build + per-doc OOV rate — the tokenizer-coverage
    check run before committing a vocab to a training run.

    vocab = terms appearing in ≥ ``min_df`` documents; per doc emit
    total tokens, out-of-vocab tokens, and the OOV per-mille
    (integer-exact: ``(n_oov·1000) div n_tokens``).

    Scale notes: one explode + two map-side-combined aggregations; the
    vocab membership join is a shuffle equi-join on term (NOT broadcast
    — a 100 TB corpus's vocab is itself large), and everything else is
    per-doc arithmetic.
    """
    tf = (
        spread(documents)
        .select("doc_id", F.explode(word_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("term")
    )
    tot = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("n_tokens"))
    inv = (
        tf.join(vocab, "term")
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("n_inv"))
    )
    return (
        tot.join(inv, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_inv"), F.lit(0))).alias(
                "n_oov"
            ),
            F.expr(
                "((n_tokens - coalesce(n_inv, 0L)) * 1000) DIV n_tokens"
            ).alias("oov_pm"),
        )
    )


def pmi_collocations(
    documents: DataFrame, min_cooc: int = 5, k: int = 50
) -> DataFrame:
    """Top-k adjacent-word collocations by an integer-exact PMI
    surrogate: score ∝ cooc / (cnt_a · cnt_b) (the corpus-constant
    bigram total drops out of the ranking), scaled as
    ``(cooc · N_tokens · 1000) div (cnt_a · cnt_b)``.

    Scale notes: unigram and bigram counts are both map-side-combined
    aggregations over one tokenized scan; the ``min_cooc`` filter prunes
    the bigram table BEFORE its two joins against the unigram counts
    (shuffle equi-joins on term).  The corpus token total is a 1-row
    broadcast.
    """
    toks = (
        spread(documents)
        .select("doc_id", word_tokens(F.col("text")).alias("t"))
        .localCheckpoint(eager=False)
    )
    uni = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    nu = uni.agg(F.sum("cnt").cast("long").alias("nu"))
    big = (
        toks.select(F.explode(shingles_of_tokens(F.col("t"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
        .where(F.col("cooc") >= min_cooc)
    )
    parts = big.select(
        "bg",
        "cooc",
        F.split(F.col("bg"), " ").getItem(0).alias("term_a"),
        F.split(F.col("bg"), " ").getItem(1).alias("term_b"),
    )
    scored = (
        parts.join(uni.select(F.col("term").alias("term_a"), F.col("cnt").alias("cnt_a")), "term_a")
        .join(uni.select(F.col("term").alias("term_b"), F.col("cnt").alias("cnt_b")), "term_b")
        .join(F.broadcast(nu))
        .select(
            "bg",
            "cooc",
            F.expr("(cooc * nu * 1000) DIV (cnt_a * cnt_b)").alias("score_q"),
        )
    )
    from pyspark.sql import Window

    # sort+limit → TakeOrderedAndProject (per-partition top-k, no full
    # sort); the rank window then runs over just k rows
    topk = scored.orderBy(F.desc("score_q"), F.asc("bg")).limit(k)
    w = Window.orderBy(F.desc("score_q"), F.asc("bg"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("long"))


def lang_source_stats(documents: DataFrame) -> DataFrame:
    """Corpus rollup: docs + exact char sums per (lang, source)."""
    return documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# Stopword set for the Gopher-style quality rules — the fixture corpus is
# synthetic lowercase prose, so the set is the function-word subset that
# actually occurs in it.
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")


def gopher_quality(
    documents: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mwl_x100: int = 300,
    max_mwl_x100: int = 1000,
    min_alpha_pct: int = 80,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style repetition/format quality rules (Rae et al. 2021 §A1.1
    heuristics), integer-exact.

    Per document: word count, mean word length ×100, alphabetic-word
    count, stopword count — then a 0/1 ``gopher_pass`` applying the
    published thresholds (parameterized; defaults are the paper's).  All
    pure JVM column expressions over one materialized token array (the
    array is projected FIRST so the four folds over it share one
    tokenization — an inline split would re-tokenize per lambda).

    Scale notes (100 TB): narrow per-row map, no shuffle at all; the
    filter runs at full scan speed and composes with predicate pushdown
    on lang/source partitions.
    """
    d = spread(documents).select(
        "doc_id", "lang", "source", word_tokens(F.col("text")).alias("words")
    )
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.size("words").cast("long").alias("n_words"),
        F.aggregate(
            "words", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("sum_wlen"),
        F.size(F.filter("words", lambda w: w.rlike("^[a-z]+$")))
        .cast("long")
        .alias("n_alpha_words"),
        F.size(F.filter("words", lambda w: w.isin(*GOPHER_STOPWORDS)))
        .cast("long")
        .alias("n_stopwords"),
    )
    mwl = F.expr("(sum_wlen * 100) DIV n_words")
    return base.select(
        "*",
        mwl.alias("mean_wlen_x100"),
        (
            F.col("n_words").between(min_words, max_words)
            & mwl.between(min_mwl_x100, max_mwl_x100)
            & (F.col("n_alpha_words") * 100 >= F.col("n_words") * min_alpha_pct)
            & (F.col("n_stopwords") >= min_stopwords)
        )
        .cast("int")
        .alias("gopher_pass"),
    )


def char_bigram_scores(documents: DataFrame) -> DataFrame:
    """Corpus-trained character-bigram familiarity score — the
    frequency-based stand-in for LM-perplexity quality filtering (docs
    whose character sequences are rare across the corpus score low).

    Two passes over the exploded bigrams: (1) train — global bigram
    counts; (2) score — per-doc sum of each bigram's corpus count, exact
    int64.  The trained model is at most |alphabet|² rows → broadcast to
    the scoring join; the bigram explode is recomputed for the second
    pass (cheap substring transform, large output — a checkpoint barrier
    measured slower than recompute for this shape, see dedup notes).

    Scale notes (100 TB): train = one map-side-combined aggregation to a
    tiny table; score = broadcast equi-join + per-doc aggregation
    (shuffle keyed on doc_id only).  No skew risk: bigram counts are
    bounded by alphabet², doc_id is unique.
    """
    d = spread(documents).where(F.length("text") >= 2).select("doc_id", "text")
    exploded = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bg"),
    )
    counts = exploded.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("bg_count"))
    return (
        exploded.join(F.broadcast(counts), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("bg_count").cast("long").alias("familiarity"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "familiarity",
            F.expr("familiarity DIV n_bigrams").alias("familiarity_per_bigram"),
        )
    )


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = 64, stride: int = 32
) -> DataFrame:
    """Sliding-window document chunking (RAG / context-window packing):
    fixed-size token chunks with overlap, ``chunk_tokens`` wide every
    ``stride`` tokens; the final chunks are shorter tails.

    Chunk starts are a ``sequence(1, n_tokens, stride)`` + ``explode`` —
    chunk text is ``slice`` over the one materialized token array, so the
    whole operator is narrow, JVM-side, shuffle-free.  Chunk identity is
    ``(doc_id, chunk_id)`` with ``chunk_id = (start-1)/stride`` — a pure
    function of the input, so re-chunking after a retry yields identical
    ids (idempotent downstream writes).  Emits the md5 of the chunk text
    (compact, oracle-portable) alongside the token count.

    Scale notes (100 TB): output is ≈ n_tokens/stride rows per doc and
    never wider than the document itself; there is no shuffle at all —
    chunking composes with a downstream repartition-by-chunk-hash write.
    """
    toks = spread(documents).select(
        "doc_id", word_tokens(F.col("text")).alias("toks")
    )
    starts = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(stride))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start"), F.lit(chunk_tokens))
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / F.lit(stride)).cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals: how much of a document is its own
    most frequent unigram / word-bigram (Rae et al., Gopher §A1.1 —
    machine-generated and boilerplate text is dominated by a few repeated
    n-grams; Gopher drops docs whose top n-gram exceeds a fraction cap).

    Per document: the most frequent unigram and bigram (ties broken by
    lexicographic order — deterministic across engines and retries) and
    their integer-exact milli occurrence fractions
    ``top1_milli = cnt*1000 // n_grams``.

    Plan: one explode per n-gram order, per-(doc, gram) count, then a
    streaming rank window per doc — both shuffles hash on doc_id-carrying
    keys, map-side combined; no joins.  At 100 TB each stage is linear in
    corpus token count and the rank window holds one row per frame.
    """
    toks = spread(documents).select(
        "doc_id", word_tokens(F.col("text")).alias("toks")
    )
    from pyspark.sql import Window

    def _top(grams: DataFrame, gram_col: str, prefix: str) -> DataFrame:
        # n_grams = Σ cnt over the SAME doc_id window partitioning as the
        # rank (r12, guide §2.4): the old totals leg re-ran the
        # tokenize+explode+rollup per order (grams referenced twice) and
        # paid a join; both window functions now share one exchange of
        # the (doc, gram) rollup and the raw gram explode runs once.
        counts = grams.groupBy("doc_id", gram_col).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("cnt").desc(), F.col(gram_col).asc()
        )
        wd = Window.partitionBy("doc_id")
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .withColumn("n_grams", F.sum("cnt").over(wd).cast("long"))
            .where(F.col("rn") == 1)
            .select(
                "doc_id",
                F.col(gram_col).alias(f"top_{prefix}"),
                F.col("cnt").alias(f"top_{prefix}_cnt"),
                F.expr("(cnt * 1000) DIV n_grams").alias(
                    f"top_{prefix}_milli"
                ),
                F.col("n_grams").alias(f"n_{prefix}s"),
            )
        )

    unis = toks.select("doc_id", F.explode("toks").alias("term"))
    bis = toks.select(
        "doc_id", F.explode(shingles_of_tokens(F.col("toks"), 2)).alias("bg")
    )
    return _top(unis, "term", "term").join(_top(bis, "bg", "bigram"), "doc_id")


def normalize_text(text: Column) -> Column:
    """Canonical text normalization for near-exact dedup: lowercase,
    collapse punctuation to nothing, squeeze whitespace runs, trim.
    Catches the case/punctuation/extra-space variants that byte-exact
    dedup misses but that are unambiguously the same document.
    Pure JVM expression; identical semantics in DuckDB for the oracle
    (lower / regexp_replace with the same RE2-safe patterns).
    """
    lowered = F.lower(text)
    no_punct = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    squeezed = F.regexp_replace(no_punct, " +", " ")
    return F.trim(squeezed)


def dedup_normalized(documents: DataFrame) -> DataFrame:
    """Exact dedup AFTER canonical normalization — one hash aggregation
    on md5(normalize_text(text)), deterministic min-doc_id keeper, with
    the group size kept as evidence.  Same single-shuffle shape (and
    100 TB story) as dedup.exact_dedup; the normalization is a narrow
    map stage fused into the scan.
    """
    return (
        spread(documents)
        .select(
            "doc_id", F.md5(normalize_text(F.col("text"))).alias("norm_hash")
        )
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
    )


def quality_classifier_scores(documents: DataFrame) -> DataFrame:
    """Hashed linear quality classifier — the fasttext-style scoring
    shape (hashed bag-of-words · weight vector) used to mine
    "wikipedia-like" documents at corpus scale, with a deterministic
    md5-derived weight table standing in for trained weights (no model
    artifact fits this sandbox; the PLUMBING — hashing, per-token
    lookup-free scoring, length normalization, thresholding — is the
    operator).

    w(token) = hex16(md5(token)[:4]) − 32768   (∈ [−32768, 32767])
    score    = Σ_tokens w(token)
    score_per_token = score DIV n_tokens       (length-normalized)
    label    = 'keep' iff score_per_token ≥ 0

    Pure JVM column expressions (split → transform → aggregate): no
    shuffle, no Python, whole-stage codegen'd — the 100 TB shape for
    per-document scoring.  Portable: Spark ``conv(hex,16,10)`` and
    DuckDB ``('0x'||hex)::BIGINT`` parse the same 4-hex-char slice.
    """
    toks = spread(documents).select(
        "doc_id", "lang", word_tokens(F.col("text")).alias("toks")
    )
    w_tok = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long") - F.lit(32768)
    )
    scored = toks.select(
        "doc_id",
        "lang",
        F.size("toks").cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform(F.col("toks"), w_tok),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "score",
        F.expr("score DIV n_tokens").alias("score_per_token"),
        F.when(F.expr("score DIV n_tokens") >= 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )


def bpe_pair_counts(documents: DataFrame) -> DataFrame:
    """Adjacent character-pair frequencies within words, weighted by
    corpus word frequency — the statistic one BPE training iteration
    maximizes (the top row IS the first merge).  Output: (sym_a, sym_b,
    n_pairs) for every adjacent pair.

    The corpus is first reduced to the (word, count) vocabulary — the
    same compression real BPE trainers apply, and the reason this scales:
    pair extraction runs once per DISTINCT word (bounded by vocabulary
    size, ~10⁵-10⁶ even at 100 TB), not once per corpus token.  Pair
    generation is a JVM ``transform(sequence(...))`` over each word —
    no Python, no explode of raw text."""
    words = documents.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_word"))
    pairs = vocab.where(F.length("word") >= 2).select(
        "n_word",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substring(word, i, 1) AS sym_a, "
                "substring(word, i + 1, 1) AS sym_b))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("n_word", "p.sym_a", "p.sym_b")
        .groupBy("sym_a", "sym_b")
        .agg(F.sum("n_word").cast("long").alias("n_pairs"))
    )


def stopword_candidates(
    documents: DataFrame, min_df_ratio_bp: int = 6000
) -> DataFrame:
    """Corpus-driven stopword discovery: words whose DOCUMENT frequency
    (fraction of docs containing the word at least once) reaches
    ``min_df_ratio_bp`` basis points, ranked by df — the data-dependent
    stopword list real pipelines derive per-language instead of shipping
    a fixed English list.  Output: (word, df, df_ratio_bp, df_rank).

    Scale notes (100 TB): ONE distinct (doc, word) aggregation (the
    dominant shuffle, keyed by word — no skew risk in the OUTPUT since it
    is per-word), then a ranking over the few rows that clear the
    threshold; the corpus total rides in via a broadcast 1-row cross
    join, never a driver collect.
    """
    from pyspark.sql import Window

    words = (
        spread(documents)
        .select("doc_id", F.explode(word_tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    df_ = words.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    total = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.orderBy(F.col("df").desc(), "word")
    return (
        df_.crossJoin(F.broadcast(total))
        .where(F.col("df") * 10000 >= F.lit(min_df_ratio_bp) * F.col("n_docs"))
        .select(
            "word",
            F.col("df").cast("long").alias("df"),
            F.expr("CAST(df * 10000 DIV n_docs AS BIGINT)").alias(
                "df_ratio_bp"
            ),
            F.row_number().over(w).cast("long").alias("df_rank"),
        )
    )


def bpe_merge_step(documents: DataFrame, top_k: int = 20) -> DataFrame:
    """ONE BPE training iteration, end-to-end in the engine: find the
    most frequent adjacent symbol pair (deterministic tie-break: count
    desc, then pair lexicographic), APPLY the merge to the vocabulary,
    and return the post-merge top-``top_k`` pair counts — the iterated
    statistic a distributed tokenizer trainer loops on.

    The merge application is ``replace(word, merged, chr(1))``: SQL
    replace is left-to-right non-overlapping, which IS the greedy BPE
    merge order, and the single-char sentinel (\\x01, absent from any
    text corpus) makes the merged pair one symbol for the recount.
    Output symbols map the sentinel back to the merged string.

    Scale notes (100 TB): both pair counts run on the (word, count)
    VOCABULARY rollup (bounded ~10^5-10^6 rows regardless of corpus
    size), the winning pair reaches the recount via a broadcast 1-row
    cross join (no driver round-trip), and the final top-k is one
    window over the bounded symbol-pair table.
    """
    from pyspark.sql import Window

    words = (
        spread(documents)
        .select(F.explode(word_tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_word"))
    # localCheckpoint barrier: the vocabulary feeds BOTH the round-1
    # winner selection and the merged recount — without it the
    # tokenize+explode subtree executes twice.
    vocab = vocab.localCheckpoint(eager=False)
    pair_expr = F.explode(
        F.expr(
            "transform(sequence(1, length(word) - 1), "
            "i -> struct(substring(word, i, 1) AS sym_a, "
            "substring(word, i + 1, 1) AS sym_b))"
        )
    ).alias("p")
    pairs1 = (
        vocab.where(F.length("word") >= 2)
        .select("n_word", pair_expr)
        .groupBy("p.sym_a", "p.sym_b")
        .agg(F.sum("n_word").alias("n_pairs"))
    )
    # winner = TakeOrdered(1) over the pair table — never a global
    # row_number window over every pair
    winner = (
        pairs1.orderBy(F.col("n_pairs").desc(), "sym_a", "sym_b")
        .limit(1)
        .select(F.concat("sym_a", "sym_b").alias("merged"))
    )
    merged_vocab = vocab.crossJoin(F.broadcast(winner)).select(
        F.expr("replace(word, merged, chr(1))").alias("word"),
        "n_word",
        "merged",
    )
    pairs2 = (
        merged_vocab.where(F.length("word") >= 2)
        .select("n_word", "merged", pair_expr)
        .groupBy("merged", "p.sym_a", "p.sym_b")
        .agg(F.sum("n_word").alias("n_pairs"))
    )
    # top-k first (TakeOrderedAndProject), then rank the bounded
    # survivors — no single-partition window over the full pair table
    w2 = Window.orderBy(F.col("n_pairs").desc(), "sym_a", "sym_b")
    return (
        pairs2.orderBy(F.col("n_pairs").desc(), "sym_a", "sym_b")
        .limit(top_k)
        .withColumn("rnk", F.row_number().over(w2))
        .select(
            F.col("merged").alias("merged_pair"),
            F.expr(
                "CASE WHEN sym_a = chr(1) THEN merged ELSE sym_a END"
            ).alias("sym_a"),
            F.expr(
                "CASE WHEN sym_b = chr(1) THEN merged ELSE sym_b END"
            ).alias("sym_b"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("rnk").cast("long").alias("pair_rank"),
        )
    )


def _bpe_vocab_chain(documents: DataFrame, n_merges: int):
    """Shared BPE merge chain: freeze ``n_merges`` winning pairs over
    the (word, count) vocabulary and greedily apply each via sentinel
    ``chr(round)`` replace.  Returns ``(vocab, merges)`` where vocab is
    (orig, word, n_word) — ``orig`` the untouched surface form (the
    encode join key), ``word`` the merged symbol string — and merges is
    the 1-row frozen merge table (m1..mN).  Winner rule: pair count
    desc, then pair lexicographic (deterministic; sentinels sort below
    ASCII letters in both engines).  Every round runs on the bounded
    vocabulary rollup with the winner as a 1-row broadcast; lazy
    ``localCheckpoint`` per round keeps the lineage flat and nothing
    executes at plan-build time.

    PRECONDITION — no control characters in input words: round ``j``
    marks its merged pair with sentinel ``chr(j)``, so a word that
    already contains chr(1)..chr(n_merges) would collide with a
    sentinel, corrupting the merge table and the reverse expansion.
    The tokenizer is a whitespace split, so the precondition is on the
    CORPUS: the documents fixture (and any sane text corpus after
    normalization) contains no U+0001..U+001F.  Callers feeding raw
    binary-ish text must strip control characters first — the
    registered oracle mirrors the same sentinel scheme, so a violation
    corrupts both sides identically rather than failing parity; this
    docstring is the guard."""
    words = (
        spread(documents)
        .select(F.explode(word_tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
        .select(F.col("word").alias("orig"), "word", "n_word")
        .localCheckpoint(eager=False)
    )
    pair_expr = F.explode(
        F.expr(
            "transform(sequence(1, length(word) - 1), "
            "i -> struct(substring(word, i, 1) AS sym_a, "
            "substring(word, i + 1, 1) AS sym_b))"
        )
    ).alias("p")
    merges: DataFrame | None = None
    for j in range(1, n_merges + 1):
        pairs = (
            vocab.where(F.length("word") >= 2)
            .select("n_word", pair_expr)
            .groupBy("p.sym_a", "p.sym_b")
            .agg(F.sum("n_word").alias("n_pairs"))
        )
        # winner = TakeOrdered(1), not a rank-1 filter over a global
        # row_number window of every pair
        winner = (
            pairs.orderBy(F.col("n_pairs").desc(), "sym_a", "sym_b")
            .limit(1)
            .select(F.concat("sym_a", "sym_b").alias(f"m{j}"))
        )
        vocab = (
            vocab.crossJoin(F.broadcast(winner))
            .select(
                "orig",
                F.expr(f"replace(word, m{j}, chr({j}))").alias("word"),
                "n_word",
            )
            .localCheckpoint(eager=False)
        )
        merges = winner if merges is None else merges.crossJoin(
            F.broadcast(winner)
        )
    return vocab, merges


def bpe_apply(
    documents: DataFrame, n_merges: int = 4, top_k: int = 30
) -> DataFrame:
    """BPE TRAINING + APPLICATION end-to-end: iterate
    :func:`bpe_merge_step`'s loop body ``n_merges`` times to freeze a
    merge table (:func:`_bpe_vocab_chain`), apply it to the vocabulary,
    and emit the resulting token inventory — pair counts → one merge
    step → full apply.

    Later merges may consume earlier sentinels (merged symbols merging
    again — real BPE), so the final map-back expands sentinels in
    REVERSE round order.  Output: the top-``top_k`` tokens of the
    merged vocabulary by corpus occurrence count.

    Scale notes (100 TB): see :func:`_bpe_vocab_chain` — bounded
    vocabulary rollups, 1-row winner broadcasts, constant loop count.
    """
    from pyspark.sql import Window

    vocab, merges = _bpe_vocab_chain(documents, n_merges)
    syms = vocab.select(
        "n_word",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word)), "
                "i -> substring(word, i, 1))"
            )
        ).alias("sym"),
    )
    tok_expr = "sym"
    for j in range(n_merges, 0, -1):
        tok_expr = f"replace({tok_expr}, chr({j}), m{j})"
    tokens = (
        syms.crossJoin(F.broadcast(merges))
        .select(F.expr(tok_expr).alias("token"), "n_word")
        .groupBy("token")
        .agg(F.sum("n_word").alias("n_tokens"))
    )
    # top-k first (TakeOrderedAndProject over the token inventory),
    # then rank only the bounded survivors
    wr = Window.orderBy(F.col("n_tokens").desc(), "token")
    return (
        tokens.orderBy(F.col("n_tokens").desc(), "token")
        .limit(top_k)
        .withColumn("token_rank", F.row_number().over(wr))
        .select(
            "token",
            F.length("token").cast("long").alias("token_len"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("token_rank").cast("long").alias("token_rank"),
        )
    )


def bpe_encode_stats(documents: DataFrame, n_merges: int = 4) -> DataFrame:
    """Encode the CORPUS with the frozen BPE merge table: per document,
    the token count after ``n_merges`` merges — the number that prices
    a training run (tokens-per-doc drives batch packing, epoch budgets,
    and per-source mixture weights), computed without materializing a
    single token string.

    The merged vocabulary maps each surface form to its symbol string;
    a word's token count is just ``length(word_merged)`` (every symbol
    — plain char or sentinel — is one token).  Documents re-join their
    words to that per-word count and aggregate.  Output: (doc_id,
    n_words, n_word_chars, n_bpe_tokens, tokens_per_100_chars).

    Scale notes (100 TB): the corpus-side cost is ONE explode + ONE
    equi-join keyed on the word (the vocabulary side is the bounded
    rollup — AQE broadcasts it when small) + one per-doc aggregation.
    The merge chain itself never touches corpus-sized data.
    """
    vocab, _ = _bpe_vocab_chain(documents, n_merges)
    enc = vocab.select(
        F.col("orig").alias("word"),
        F.length("word").alias("n_toks"),
    )
    words_by_doc = (
        spread(documents)
        .select(
            "doc_id", F.explode(word_tokens(F.col("text"))).alias("word")
        )
        .where(F.col("word") != "")
    )
    return (
        words_by_doc.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_word_chars"),
            F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_word_chars",
            "n_bpe_tokens",
            F.expr(
                "CAST(n_bpe_tokens * 100 DIV n_word_chars AS BIGINT)"
            ).alias("tokens_per_100_chars"),
        )
    )


def heavy_hitters_bounds(
    documents: DataFrame,
    n_shards: int = 8,
    capacity: int = 64,
    top_n: int = 10,
) -> DataFrame:
    """Distributed frequent-items summary with deterministic error
    bounds — the SpaceSaving/Misra-Gries MERGE contract in relational
    algebra.  Each data shard (doc_id % n_shards) keeps only its
    top-``capacity`` (word, count) rows; the largest count a shard
    DROPPED is its rank-(capacity+1) count ``eps_s``, so after merging,
    a word's true corpus count is bracketed by::

        lower = Σ kept counts  ≤  true  ≤  lower + Σ eps_s over shards
                                            where the word was truncated

    The exact top-``top_n`` rides along as the EVAL side with a
    ``bounds_hold`` boolean — mathematically always TRUE, so any
    arithmetic slip in the summary/merge hash-fails a driver row.

    Scale notes (100 TB): the (shard, word) rollup is one map-side-
    combinable aggregation; the per-shard truncation is a bounded
    window (capacity+1 rows survive per shard) and everything merged
    afterward is ≤ n_shards·capacity rows + a 1-row total-eps
    broadcast.  Production drops the exact-count leg; the summary is
    the answer.
    """
    from pyspark.sql import Window

    ww = (
        spread(documents)
        .select(
            (F.col("doc_id") % n_shards).alias("shard"),
            F.explode(word_tokens(F.col("text"))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    swc = ww.groupBy("shard", "word").agg(F.count(F.lit(1)).alias("cnt"))
    wr = Window.partitionBy("shard").orderBy(F.col("cnt").desc(), "word")
    rkd = swc.select(
        "shard", "word", "cnt", F.row_number().over(wr).alias("rn")
    )
    kept = rkd.where(F.col("rn") <= capacity).select("shard", "word", "cnt")
    eps = rkd.where(F.col("rn") == capacity + 1).select(
        "shard", F.col("cnt").alias("eps_s")
    )
    teps = eps.agg(F.coalesce(F.sum("eps_s"), F.lit(0)).alias("total_eps"))
    m = (
        kept.join(eps, "shard", "left")
        .groupBy("word")
        .agg(
            F.sum("cnt").alias("lower_b"),
            F.coalesce(F.sum("eps_s"), F.lit(0)).alias("eps_covered"),
        )
    )
    ex = ww.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    # two-phase top-k: orderBy+limit plans as TakeOrderedAndProject
    # (per-partition partial top-k, merge of top_n rows) instead of a
    # single-partition sort of the WHOLE vocabulary; the rank window
    # then runs over a provably bounded ≤ top_n-row input.  The rank
    # partition key pmod(exact_n, 1) is constant (≡ 0) but NOT foldable
    # — a bare lit(1) is stripped by FoldablePropagation, reverting the
    # spec to empty and re-triggering WindowExec's global-window
    # warning; this keeps the single-partition choice explicit and
    # warning-free over the bounded input.
    wt = Window.partitionBy(F.pmod(F.col("exact_n"), F.lit(1))).orderBy(
        F.col("exact_n").desc(), "word"
    )
    top = (
        ex.orderBy(F.col("exact_n").desc(), "word")
        .limit(top_n)
        .select("word", "exact_n", F.row_number().over(wt).alias("hh_rank"))
    )
    return (
        top.join(m, "word")
        .crossJoin(F.broadcast(teps))
        .select(
            "word",
            F.col("hh_rank").cast("long").alias("hh_rank"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("lower_b").cast("long").alias("lower_bound"),
            (F.col("lower_b") + F.col("total_eps") - F.col("eps_covered"))
            .cast("long")
            .alias("upper_bound"),
            (
                (F.col("lower_b") <= F.col("exact_n"))
                & (
                    F.col("exact_n")
                    <= F.col("lower_b")
                    + F.col("total_eps")
                    - F.col("eps_covered")
                )
            ).alias("bounds_hold"),
        )
    )


def bigram_lm_score(documents: DataFrame) -> DataFrame:
    """Count-based bigram language-model scoring — the perplexity-style
    quality signal of corpus curation, in integer-exact form so two
    engines agree bit-for-bit.  The corpus trains its own bigram model
    (c(w1,w2) and left-context totals c(w1) = Σ_w c(w1,w)); each
    document's surprisal is Σ over its bigrams of
    ``⌊log2 c(w1)⌋ − ⌊log2 c(w1,w2)⌋`` — the integer skeleton of
    −log2 p(w2|w1), computed as binary-digit counts
    (``length(conv(c, 10, 2))``, the +1s cancelling) so no floating
    log ever runs.  Low average bits = predictable/boilerplate text,
    high = rare constructions — the two tails a curation pipeline
    clips.

    Scale notes: one tokenized scan; bigram and context counts are
    map-side-combined aggregations; scoring is two shuffle equi-joins
    (bg, then w1) against count tables pruned to observed keys; the
    per-doc rollup is a hash aggregation.  No windows, no broadcast of
    unbounded sides."""
    toks = (
        spread(documents)
        .select("doc_id", word_tokens(F.col("text")).alias("t"))
        .localCheckpoint(eager=False)
    )
    bg = (
        toks.select(
            "doc_id", F.explode(shingles_of_tokens(F.col("t"), 2)).alias("bg")
        )
        .localCheckpoint(eager=False)
    )
    c12 = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    c1 = (
        c12.select(
            F.split(F.col("bg"), " ").getItem(0).alias("w1"), "c12"
        )
        .groupBy("w1")
        .agg(F.sum("c12").cast("long").alias("c1"))
    )
    scored = (
        bg.join(c12, "bg")
        .select(
            "doc_id",
            F.split(F.col("bg"), " ").getItem(0).alias("w1"),
            "c12",
        )
        .join(c1, "w1")
        .select(
            "doc_id",
            (
                F.length(F.conv(F.col("c1"), 10, 2))
                - F.length(F.conv(F.col("c12"), 10, 2))
            ).cast("long").alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.expr("CAST(sum(bits) * 100 DIV count(1) AS BIGINT)").alias(
            "avg_centibits"
        ),
    )


# Shared smoothed-ratio arithmetic of the importance family: the
# Jelinek-Mercer λ=1/2 uniform-prior form, cross-multiplied to one
# integer division —
#   P̂_d(b) = (cnt_d(b) + tot_d/256) / (2·tot_d)
#   ratio  = P̂_tgt/P̂_src
#          = (tgt_cnt·256 + tgt_tot)·src_tot / ((src_cnt·256 + src_tot)·tgt_tot)
# Chosen over add-1 smoothing because an UNSEEN bucket scores exactly
# 10000 bp (neutral) instead of src_tot/tgt_tot (which biases unknown
# vocabulary toward whichever side has fewer tokens).  The product is
# computed in DECIMAL(38,0): int64 would wrap SILENTLY (non-ANSI) near
# ~1.9e6 model tokens in the worst case of everything landing in ONE
# bucket — uniform fill only buys ~10^7 — and a wrapped ratio corrupts
# streaming keep/drop gates without any error.  Decimal is exact to
# ~10^15 tokens a side regardless of bucket skew (worst single-bucket
# product ≈ tot²·256·10⁴ < 10^38); DuckDB's // promotes to HUGEINT on
# the same formula, so the engines stay value-identical throughout.
_IW_RATIO_SQL = (
    "CAST((CAST(coalesce(tgt_cnt, 0) AS DECIMAL(38,0)) * 256 + tgt_tot)"
    " * src_tot * 10000 "
    "DIV ((CAST(coalesce(src_cnt, 0) AS DECIMAL(38,0)) * 256 + src_tot)"
    " * tgt_tot) AS BIGINT)"
)

_IW_N_BUCKETS = 256


def _iw_bucket_expr(buckets_seed: int) -> Column:
    """Token → bucket: first md5 byte of the seeded hash (0..255)."""
    return F.expr(
        f"CAST(conv(substring(md5(concat('{buckets_seed}|', tok)), "
        "1, 2), 16, 10) AS BIGINT)"
    )


def importance_weights(
    documents: DataFrame,
    target: Column,
    buckets_seed: int = 97,
) -> DataFrame:
    """Hashed-feature importance weighting for domain-targeted data
    selection (the DSIR recipe: score each document by how much more
    likely its features are under a TARGET domain than under the raw
    corpus, using hashed n-gram count models — Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    ``target`` marks the rows defining the target domain (e.g.
    ``lang == 'en'``).  Word unigrams hash into 256 buckets (first md5
    byte, seeded family); each token contributes its bucket's smoothed
    likelihood ratio in BASIS POINTS (``_IW_RATIO_SQL`` — uniform-
    prior smoothing, so a bucket unseen in training scores exactly
    10000/neutral), and a document's weight is the per-token average.
    >10000 ⇔ the document's vocabulary is over-represented in the
    target.  (DSIR sums log-ratios; the per-token bp ratio is monotone
    in the log-ratio and its sum is the first-order integer surrogate
    — chosen over a ⌊log2⌋ skeleton because floor-log granularity
    collapses sub-2× distributional differences to zero.)  Every
    quantity is a nonnegative integer, so Spark ``DIV`` and DuckDB
    ``//`` agree exactly.

    This is the FUSED train-and-score form (one tokenized scan, counts
    and scoring off the same checkpoint); the deployment split —
    train once, gate a stream forever — is ``importance_count_model``
    + ``score_against_importance_model`` below, which this function
    must stay value-identical to (pinned in tests).

    Scale notes: one tokenized scan; both count models are ≤256-row
    rollups broadcast back onto the token stream plus a 1-row totals
    cross; the per-doc rollup is a hash aggregation.  No windows, no
    unbounded broadcasts — the corpus is touched once however big."""
    toks = spread(documents).select(
        "doc_id",
        target.alias("_is_tgt"),
        F.explode(word_tokens(F.col("text"))).alias("tok"),
    )
    b = toks.select(
        "doc_id", "_is_tgt", _iw_bucket_expr(buckets_seed).alias("bucket")
    ).localCheckpoint(eager=False)
    src = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("src_cnt")
    )
    tgt = (
        b.where(F.col("_is_tgt"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tgt_cnt"))
    )
    totals = b.agg(
        F.count(F.lit(1)).cast("long").alias("src_tot"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0))
        .cast("long")
        .alias("tgt_tot"),
    )
    scored = (
        b.join(F.broadcast(src), "bucket")
        .join(F.broadcast(tgt), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", F.expr(_IW_RATIO_SQL).alias("ratio_bp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("ratio_bp").cast("long").alias("sum_ratio_bp"),
        F.expr(
            "CAST(sum(ratio_bp) DIV count(1) AS BIGINT)"
        ).alias("avg_ratio_bp"),
    )


def importance_count_model(
    documents: DataFrame,
    target: Column,
    buckets_seed: int = 97,
) -> DataFrame:
    """Train-once half of the importance family: the DENSE 256-bucket
    hashed count model (bucket, src_cnt, tgt_cnt, src_tot, tgt_tot) —
    dense so a scorer joining against it always hits (unseen buckets
    carry zero counts and score neutral), totals on every row so the
    model is one self-contained broadcastable frame.  Persist it next
    to the corpus snapshot like any other catalog artifact; counts are
    cell-wise addable, so a new shard's model folds in by summing
    counts and totals."""
    toks = spread(documents).select(
        target.alias("_is_tgt"),
        F.explode(word_tokens(F.col("text"))).alias("tok"),
    )
    b = toks.select(
        "_is_tgt", _iw_bucket_expr(buckets_seed).alias("bucket")
    ).localCheckpoint(eager=False)
    src = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("src_cnt")
    )
    tgt = (
        b.where(F.col("_is_tgt"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tgt_cnt"))
    )
    totals = b.agg(
        F.count(F.lit(1)).cast("long").alias("src_tot"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0))
        .cast("long")
        .alias("tgt_tot"),
    )
    grid = documents.sparkSession.range(_IW_N_BUCKETS).select(
        F.col("id").cast("long").alias("bucket")
    )
    return (
        grid.join(F.broadcast(src), "bucket", "left")
        .join(F.broadcast(tgt), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.coalesce(F.col("src_cnt"), F.lit(0)).cast("long").alias("src_cnt"),
            F.coalesce(F.col("tgt_cnt"), F.lit(0)).cast("long").alias("tgt_cnt"),
            "src_tot",
            "tgt_tot",
        )
    )


def score_against_importance_model(
    documents: DataFrame,
    model: DataFrame,
    buckets_seed: int = 97,
) -> DataFrame:
    """Score documents against a PRE-TRAINED importance model (the
    inference half: tokenize → bucket → one broadcast join against the
    dense 256-row model → per-doc rollup).  ``buckets_seed`` must be
    the seed the model was trained with — the hash family is part of
    the model contract.  Value-identical to ``importance_weights``
    when the model was trained on the same corpus (pinned in tests);
    tokens hashing to buckets the training corpus never produced score
    exactly 10000 (the smoothing's neutral point), so novel vocabulary
    neither sinks nor rescues a document."""
    toks = spread(documents).select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("tok")
    )
    b = toks.select("doc_id", _iw_bucket_expr(buckets_seed).alias("bucket"))
    scored = b.join(F.broadcast(model), "bucket").select(
        "doc_id", F.expr(_IW_RATIO_SQL).alias("ratio_bp")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("ratio_bp").cast("long").alias("sum_ratio_bp"),
        F.expr(
            "CAST(sum(ratio_bp) DIV count(1) AS BIGINT)"
        ).alias("avg_ratio_bp"),
    )


def merge_importance_models(model_a: DataFrame, model_b: DataFrame) -> DataFrame:
    """Fold two importance count models (disjoint corpus shards) into
    the model of their union — the incremental-maintenance half of the
    importance family: when a new shard lands, train a model on the
    NEW documents only and fold it into the catalog model, never
    re-scanning history.  Exact because every quantity is a plain
    count: per-bucket counts add cell-wise, totals add once (each
    dense 256-row model carries its totals on every row, so the merge
    joins the grids on bucket and adds column-wise).

    ``merge(model(A), model(B)) == model(A ∪ B)`` for disjoint A, B —
    pinned under the value oracle by cdc_importance_model_maintenance."""
    b = (
        model_b.withColumnRenamed("src_cnt", "_src_cnt_b")
        .withColumnRenamed("tgt_cnt", "_tgt_cnt_b")
        .withColumnRenamed("src_tot", "_src_tot_b")
        .withColumnRenamed("tgt_tot", "_tgt_tot_b")
    )
    return model_a.join(b, "bucket").select(
        "bucket",
        (F.col("src_cnt") + F.col("_src_cnt_b")).cast("long").alias("src_cnt"),
        (F.col("tgt_cnt") + F.col("_tgt_cnt_b")).cast("long").alias("tgt_cnt"),
        (F.col("src_tot") + F.col("_src_tot_b")).cast("long").alias("src_tot"),
        (F.col("tgt_tot") + F.col("_tgt_tot_b")).cast("long").alias("tgt_tot"),
    )


CHUNK_W, CHUNK_S = 32, 24  # sliding-window chunking: window / stride


def chunk_rows(docs: DataFrame) -> DataFrame:
    """Sliding token-window chunker: per-chunk rows (doc_id,
    chunk_idx, start_tok, n, chunk_text) for any (doc_id, text) frame
    — chunk count is closed-form ``max(1, ⌈(n−W)/S⌉+1)`` so the last
    window always reaches the doc end and no fully-contained tail is
    emitted.  Shared by the doc_chunk_windows oracle query, the
    curation-v7 composition, and the streaming chunk gate.

    Scale notes: embarrassingly parallel — split → closed-form chunk
    count → sequence + posexplode → slice; zero shuffles, zero
    windows; fan-out bounded by n/S per doc."""
    W, S = CHUNK_W, CHUNK_S
    d = spread(docs).select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
    )
    n = d.select("doc_id", "toks", F.size("toks").alias("n")).where(
        F.col("n") > 0
    )
    c = n.withColumn(
        "nc",
        F.when(F.col("n") <= W, F.lit(1)).otherwise(
            F.expr(f"(n - {W} + {S} - 1) DIV {S} + 1")
        ),
    )
    e = c.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(F.expr("sequence(0, nc - 1)")).alias(
            "chunk_idx", "_i"
        ),
    ).select(
        "doc_id",
        "toks",
        "n",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("_i") * S).cast("long").alias("start_tok"),
    )
    return e.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        "n",
        F.array_join(
            F.slice(F.col("toks"), F.col("start_tok") + 1, F.lit(W)), " "
        ).alias("chunk_text"),
    )


def kneser_ney_bigram_table(
    documents: DataFrame, top_contexts: int = 20, top_k: int = 3
) -> DataFrame:
    """Kneser–Ney smoothed bigram model table — the LM behind
    CCNet-style corpus quality filtering, in INTEGER-EXACT form: for
    the ``top_contexts`` most frequent left contexts w1, the ``top_k``
    continuations w2 by the KN probability

        P_KN(w2|w1) = max(c12 − D, 0)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/NB

    with discount D = 3/4 and NB = distinct bigram types.  Both terms
    are emitted as micro-probabilities via integer floor division
    (``main_micro + backoff_micro``), every input an int64 count —
    so a SQL oracle replays the smoothed probability bit-for-bit, no
    floating point anywhere.  N1+(·w2) (distinct LEFT contexts of w2)
    is the continuation count that makes KN the right backoff: a word
    frequent only inside one collocation ("Francisco") gets a LOW
    unigram backoff even though its raw count is high.

    Scale notes (100 TB): one tokenized scan; c12/c1/N1+ are map-side
    combinable hash aggs over bigram TYPES (vocabulary-, not corpus-,
    sized); NB is the allowlisted 1-row scalar broadcast; the top-k
    window partitions per context over that context's continuation
    list (Zipf-bounded).  Overflow discipline: the two probability
    terms are floored separately so every intermediate stays far
    inside int64 (main ≤ 4e6·1e6, backoff numerator ≤ 3·|V|²·1e6)."""
    from pyspark.sql import Window

    toks = (
        spread(documents)
        .select("doc_id", word_tokens(F.col("text")).alias("t"))
        .localCheckpoint(eager=False)
    )
    bg = toks.select(
        F.explode(shingles_of_tokens(F.col("t"), 2)).alias("bg")
    ).select(
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
    )
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=False)  # feeds c1, nbwd, NB, candidates
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1plus_fwd"),
    )
    nbwd = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1plus_bwd")
    )
    nb = c12.agg(F.count(F.lit(1)).cast("long").alias("nb_types"))
    ctx = (
        c1.orderBy(F.col("c1").desc(), F.col("w1").asc())
        .limit(top_contexts)
    )
    cand = (
        c12.join(ctx, "w1")
        .join(nbwd, "w2")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1plus_fwd",
            "n1plus_bwd",
            F.expr(
                "CAST(greatest(4 * c12 - 3, 0) * 1000000 DIV (4 * c1) "
                "AS BIGINT)"
            ).alias("main_micro"),
            F.expr(
                "CAST(3 * n1plus_fwd * n1plus_bwd * 1000000 "
                "DIV (4 * c1 * nb_types) AS BIGINT)"
            ).alias("backoff_micro"),
        )
        .withColumn(
            "p_kn_micro", F.col("main_micro") + F.col("backoff_micro")
        )
    )
    w = Window.partitionBy("w1").orderBy(
        F.col("p_kn_micro").desc(), F.col("w2").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1plus_fwd",
            "n1plus_bwd",
            "p_kn_micro",
            "rank",
        )
    )
