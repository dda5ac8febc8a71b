"""Property checks for the late-round-8 operators.

The compaction bin rule, the Morton interleave, and the importance
ratio are all pure integer arithmetic — hypothesis drives hundreds of
random cases against independent Python references without a JVM
round-trip (the batched Spark forms are pinned by their own tests and
the DuckDB oracles)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def _bins_reference(sizes: list[int], target: int) -> list[int]:
    """Independent first-fit walk: bin of file i = exclusive prefix
    DIV target (what compaction_plan computes distributively)."""
    out, acc = [], 0
    for s in sizes:
        out.append(acc // target)
        acc += s
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1,
             max_size=200),
    st.integers(min_value=1, max_value=5_000),
)
def test_compaction_bins_are_contiguous_and_conserving(sizes, target):
    bins = _bins_reference(sizes, target)
    # bins are non-decreasing along the sort order (adjacency); an
    # OVERSIZED file may skip indices (hypothesis found sizes=[2,1],
    # target=1 -> bins {0,2}), so density is deliberately NOT claimed
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # the first-fit invariant: each file's exclusive prefix lies
    # inside its bin's byte range
    acc = 0
    for s, b in zip(sizes, bins):
        assert acc >= b * target and acc < (b + 1) * target
        acc += s


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_morton_divmod_equals_bit_twiddling(x, y):
    from aws_kinesis_data_streams_replicator_spark.operators.layout import (
        zvalue_sql,
    )

    # evaluate the div/mod SQL text as Python (// and % semantics
    # match DuckDB for nonnegative ints)
    expr = zvalue_sql("X", "Y", div="//").replace("X", str(x)).replace(
        "Y", str(y)
    )
    got = eval(expr)  # noqa: S307 - generated arithmetic, test-only
    want = 0
    for b in range(16):
        want |= ((x >> b) & 1) << (2 * b)
        want |= ((y >> b) & 1) << (2 * b + 1)
    assert got == want


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),   # tgt_cnt
    st.integers(min_value=0, max_value=100_000),  # src_cnt
    st.integers(min_value=1, max_value=200_000),  # tgt_tot
    st.integers(min_value=1, max_value=2_000_000),  # src_tot
)
def test_importance_ratio_properties(tgt_cnt, src_cnt, tgt_tot, src_tot):
    """The smoothed bp ratio: neutral at zero evidence, monotone in
    target count, anti-monotone in source count."""

    def ratio(tc, sc, tt, stt):
        return (tc * 256 + tt) * stt * 10000 // ((sc * 256 + stt) * tt)

    assert ratio(0, 0, tgt_tot, src_tot) == 10000
    assert ratio(tgt_cnt + 1, src_cnt, tgt_tot, src_tot) >= ratio(
        tgt_cnt, src_cnt, tgt_tot, src_tot
    )
    assert ratio(tgt_cnt, src_cnt + 1, tgt_tot, src_tot) <= ratio(
        tgt_cnt, src_cnt, tgt_tot, src_tot
    )
