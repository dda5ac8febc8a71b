"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Exactness strategy: float dot products are order-sensitive, so for
oracle-checkable similarity we **quantize** each component to a µ-scaled
BIGINT (``round(x * 1e6)``) and do the dot product in exact int64
arithmetic (64 dims × (1e6)² × 64 ≈ 6.4e13 ≪ 2^63).  Integer sums are
associative → identical in any engine / any partitioning.  ``cosine``
keeps a float fast path for non-oracle use.

Scale notes: all expressions here are ``transform``/``zip_with``/
``aggregate`` over the array — per-row, no shuffle, codegen'd.  Brute
force top-k is a broadcast-join + per-partition top-k (see
operators/similarity.py); the LSH variant buckets first.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

QUANT_SCALE = 1_000_000


def quantize_embedding(emb: Column) -> Column:
    """array<float> → array<bigint>, component-wise round(x*1e6)."""
    return F.transform(
        emb, lambda x: F.round(x.cast("double") * F.lit(QUANT_SCALE)).cast("long")
    )


def dot_q(a: Column, b: Column, dim: int | None = None) -> Column:
    """Exact int64 dot product of two quantized vectors.

    Deliberately the aggregate/zip_with lambda: a measured alternative —
    flattening to a 2·dim-term element_at expression — is ~8× SLOWER
    because the generated method blows past HotSpot's JIT bytecode limit
    and runs interpreted.  ``dim`` is accepted for API stability but the
    lambda path handles any dimension.
    """
    del dim  # dimension-independent
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Float cosine similarity (fast path; not oracle-exact)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (na * nb)


def quantize_int8(q: Column, maxabs: Column) -> Column:
    """Quantized-µ vector → int8 codes in [-127, 127]:
    ``sign(x) · floor((|x|·127) / max|x|)``.

    Sign is split out so both engines divide non-negative integers
    (Spark's floor-of-double-division equals DuckDB ``//`` only for
    non-negative operands; the magnitudes here — ≤127·|q| ≈ 2.5e8 ≪ 2⁵³
    with quotient ulp ≪ 1/maxabs — make the double division exact).
    Pass ``maxabs = greatest(array_max(transform(q, abs)), 1)``: the
    ``1`` floor makes the all-zero vector quantize to zeros instead of
    dividing by zero.
    """
    return F.transform(
        q,
        lambda x: (F.when(x < F.lit(0), F.lit(-1)).otherwise(F.lit(1)))
        * F.floor((F.abs(x) * F.lit(127)) / maxabs).cast("long"),
    )


def sqdist_q(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 distance of two quantized vectors.
    Headroom: 64 dims × (2e6)² ≈ 2.6e14 ≪ 2^63.  Same aggregate/
    zip_with shape as ``dot_q`` (see its JIT rationale)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _div127_nonneg(x: Column) -> Column:
    """Exact ``x DIV 127`` for a NONNEGATIVE decimal ``x``: decimal
    division (exact here — the fractional part of n/127 is k/127 ≤
    126/127 ≈ 0.9921, four orders of magnitude farther from an integer
    than the scale-6 rounding half-ulp), then floor.  Chosen over float
    ``/`` + cast, which only matches integer DIV while the numerator is
    below 2^53."""
    return F.floor(x / F.lit(127)).cast("long")


def dequantize_int8(q8: Column, maxabs: Column) -> Column:
    """Inverse of ``quantize_int8``: code → µ-scaled component,
    sign-split so Spark DIV and DuckDB // floor identically
    (``sign(c) · (|c| · maxabs DIV 127)``).  The product is computed in
    decimals, so the contract holds for any |c|·maxabs < 10^32 (the
    scale-6 quotient's integer headroom) — not just below the 2^53
    float-mantissa bound of the previous float-``/``-then-cast form."""
    m = maxabs.cast("decimal(19,0)")
    return F.transform(
        q8,
        lambda c: F.when(
            c < 0, -_div127_nonneg((-c).cast("decimal(19,0)") * m)
        ).otherwise(_div127_nonneg(c.cast("decimal(19,0)") * m)),
    )
