"""Deterministic, engine-portable hashing/tokenization primitives.

Dedup and fingerprinting need hash functions that produce IDENTICAL
results in Spark and in the DuckDB oracle.  Spark's ``xxhash64``/``hash``
and DuckDB's ``hash`` are different algorithms, so the portable family
here is built on **MD5 hex strings** (bit-identical in both engines).
``md5(seed || '|' || value)`` gives an indexed hash family for MinHash;
lexicographic MIN over hex strings is a valid uniform min-hash.

Scale notes: md5 is ~2-3× slower than xxhash64 but still JVM-side,
vectorized, and shuffle-free here; at 100 TB you would swap
``md5_seeded`` for ``xxhash64(seed, col)`` (same call shape) once the
oracle harness is no longer in the loop.

Tokenization: whitespace ``split`` — matches DuckDB ``string_split``
exactly (including empty-string tokens on double spaces; the driver data
is single-spaced).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def word_tokens(text: Column) -> Column:
    """Whitespace tokens (portable: Spark split == DuckDB string_split)."""
    return F.split(text, " ")


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a *materialized* token-array column.

    IMPORTANT: ``toks`` must be an attribute reference (a column produced
    by a previous projection), not an inline ``split(...)`` expression —
    higher-order lambdas are interpreted (no common-subexpression
    elimination), so an inline split would re-tokenize the document for
    every element access: O(words²) per document.  Tokenize once in its
    own projection (CollapseProject keeps non-cheap duplicated
    expressions un-inlined), then call this.
    """
    n = F.size(toks)
    # sequence(1, 0) would be a DESCENDING [1, 0] in Spark — guard short docs.
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles straight from text — ONLY for short/one-off use;
    see shingles_of_tokens for the hot path."""
    return shingles_of_tokens(word_tokens(text), k)


def md5_seeded(value: Column, seed: int) -> Column:
    """Portable indexed hash family: md5('<seed>|' || value) → 32-hex-char."""
    return F.md5(F.concat(F.lit(f"{seed}|"), value))


def simhash_bits(token_hashes: Column) -> Column:
    """32-bit SimHash over an array of md5 hex strings, as a '0'/'1' string.

    Bit *p* is the majority of the high bit of hex nibble *p* across all
    token hashes (hex char >= '8' ⇔ high bit set — a pure string compare,
    identical in Spark and DuckDB).  Returns a 32-char bitstring so no
    engine-specific integer/hex conversions are needed.
    """
    n = F.size(token_hashes)
    bits = [
        F.when(
            F.size(
                F.filter(
                    token_hashes,
                    lambda h: F.substring(h, p + 1, 1) >= F.lit("8"),
                )
            )
            * 2
            > n,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in range(32)
    ]
    return F.concat(*bits)
