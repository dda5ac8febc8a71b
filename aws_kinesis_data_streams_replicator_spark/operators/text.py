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


def lang_source_stats(documents: DataFrame) -> DataFrame:
    """Corpus rollup: docs + exact char sums per (lang, source)."""
    return documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
