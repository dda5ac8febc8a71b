"""Property checks for the t-closeness EMD arithmetic.

dq_t_closeness clears denominators: for ordered bands 0..m-1,

    t_bp = 10000 * Σ_j |cumN_j·N − cumG_j·n|  //  (n·N·(m−1))

which must equal ⌊10⁴ · EMD⌋ with EMD = Σ_j |cumP_j − cumQ_j|/(m−1)
computed in exact rationals.  Hypothesis drives random class/global
count vectors against a Fraction reference — no JVM round-trip (the
Spark/DuckDB twins are pinned by the value oracle)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st

M = 3  # ordered bands: neg < low < high


def _t_bp_cleared(class_counts, global_counts):
    n = sum(class_counts)
    big_n = sum(global_counts)
    cum_c = cum_g = 0
    num = 0
    for j in range(M - 1):
        cum_c += class_counts[j]
        cum_g += global_counts[j]
        num += abs(cum_c * big_n - cum_g * n)
    return num * 10000 // (n * big_n * (M - 1))


def _t_bp_reference(class_counts, global_counts):
    n = sum(class_counts)
    big_n = sum(global_counts)
    cum_c = cum_g = Fraction(0)
    emd = Fraction(0)
    for j in range(M - 1):
        cum_c += class_counts[j]
        cum_g += global_counts[j]
        emd += abs(cum_c / n - cum_g / big_n)
    return int(emd / (M - 1) * 10000)


counts = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=M, max_size=M
).filter(lambda c: sum(c) > 0)


@settings(max_examples=300, deadline=None)
@given(counts, counts)
def test_cleared_denominator_matches_exact_rational(cls, extra):
    # the global distribution contains the class (as in the query)
    glob = [a + b for a, b in zip(cls, extra)]
    assert _t_bp_cleared(cls, glob) == _t_bp_reference(cls, glob)


@settings(max_examples=300, deadline=None)
@given(counts, counts)
def test_t_bp_bounded(cls, extra):
    glob = [a + b for a, b in zip(cls, extra)]
    assert 0 <= _t_bp_cleared(cls, glob) <= 10_000


def test_identical_distribution_scores_zero():
    assert _t_bp_cleared([3, 5, 7], [30, 50, 70]) == 0


def test_opposite_extremes_score_full():
    # class all in band 0, rest of the world all in band 2:
    # EMD = (|1-g| + |1-g|)/2 where g = cum share of the class itself —
    # approaches 10000 as the class share of the table shrinks
    assert _t_bp_cleared([100, 0, 0], [100, 0, 100_000]) > 9_900
