"""Properties of the doc_chunk_windows chunking rule.

The value oracle pins the emitted rows; these pin the RULE itself —
for every doc length, the closed-form chunk count and the arithmetic
overlap column must equal what a direct interval model produces:

* the chunk windows exactly cover [0, n) (no token unchunked);
* no chunk is fully contained in its predecessor (no degenerate tail);
* overlap_tokens equals the true interval intersection with the
  previous chunk.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

W, S = 32, 24  # must match _DCW_W/_DCW_S in plans/queries.py


def _chunks(n):
    nc = 1 if n <= W else -(-(n - W) // S) + 1
    out = []
    for i in range(nc):
        start = i * S
        length = min(W, n - start)
        out.append((i, start, length))
    return out


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=1, max_value=5_000))
def test_windows_cover_exactly_and_no_degenerate_tail(n):
    ch = _chunks(n)
    covered = set()
    for _, start, length in ch:
        assert length > 0
        covered.update(range(start, start + length))
    assert covered == set(range(n))
    for (_, s0, l0), (_, s1, l1) in zip(ch, ch[1:]):
        # successor must extend beyond its predecessor
        assert s1 + l1 > s0 + l0


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=1, max_value=5_000))
def test_overlap_formula_matches_interval_intersection(n):
    ch = _chunks(n)
    for (i, start, _length) in ch:
        formula = (
            0
            if i == 0
            else max(0, min((i - 1) * S + W, n) - start)
        )
        if i == 0:
            true_overlap = 0
        else:
            _, ps, pl = ch[i - 1]
            true_overlap = max(0, min(ps + pl, start + W, n) - start)
        assert formula == true_overlap
