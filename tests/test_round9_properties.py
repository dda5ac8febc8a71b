"""Property checks for the round-9 fold operators.

Both folds are pure integer/set algebra — hypothesis drives hundreds
of random cases against independent Python references without a JVM
round-trip (the Spark forms are pinned by their own tests and DuckDB
oracles):

* compaction_step's epoch fold: however an inventory is split into
  micro-batches, the emitted bins are key-contiguous runs, globally
  contiguously numbered, byte-conserving, and each epoch's binning
  matches the prefix-DIV rule over (carried tail ∪ batch);
* fold_components: contracting a labeling to star edges and re-running
  min-label CC over (stars ∪ new edges) equals from-scratch CC over
  (old ∪ new edges) — for ANY graphs, not just the fixture's."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


# --------------------------------------------------------------------------
# compaction_step reference model
# --------------------------------------------------------------------------


def _step_reference(pending, batch, target, bins_emitted):
    """Python twin of layout.compaction_step: DIV binning over
    (pending ∪ batch) in key order; close all but the max bin with
    dense ids continuing at bins_emitted; carry the max bin."""
    inv = sorted(pending + batch)
    acc, binned = 0, []
    for k, s in inv:
        binned.append((acc // target, k, s))
        acc += s
    top = max(b for b, _, _ in binned)
    local_closed = sorted({b for b, _, _ in binned if b < top})
    renum = {b: i + bins_emitted for i, b in enumerate(local_closed)}
    closed = {}
    for b, k, s in binned:
        if b < top:
            closed.setdefault(renum[b], []).append((k, s))
    new_pending = [(k, s) for b, k, s in binned if b == top]
    return closed, new_pending


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=2_000), min_size=1,
             max_size=120),
    st.integers(min_value=1, max_value=900),
    st.data(),
)
def test_epoch_fold_conserves_and_numbers_contiguously(sizes, target, data):
    inv = [(k, s) for k, s in enumerate(sizes)]  # keys = arrival order
    # random split into 1..6 batches (key-ordered, as micro-batch
    # ingest produces)
    n_batches = data.draw(st.integers(min_value=1, max_value=6))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(inv)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(inv)]:
        batches.append(inv[prev:c])
        prev = c
    pending, emitted, all_closed = [], 0, {}
    for b in batches:
        if not (pending or b):
            continue
        closed, pending = _step_reference(pending, b, target, emitted)
        all_closed.update(closed)
        emitted += len(closed)
    # ids are 0..m-1 with no gaps across epochs
    assert sorted(all_closed) == list(range(len(all_closed)))
    # conservation + key contiguity: closed bins in id order, then the
    # final pending, replay the inventory exactly
    replay = [kv for i in sorted(all_closed) for kv in all_closed[i]]
    replay += pending
    assert replay == inv


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=2_000), min_size=2,
             max_size=80),
    st.integers(min_value=1, max_value=900),
)
def test_single_flush_equals_div_reference(sizes, target):
    inv = [(k, s) for k, s in enumerate(sizes)]
    acc, want = 0, {}
    for k, s in inv:
        want.setdefault(acc // target, []).append((k, s))
        acc += s
    closed, pending = _step_reference([], inv, target, 0)
    got = dict(closed)
    if pending:
        got[len(closed)] = pending
    assert [v for _, v in sorted(got.items())] == [
        v for _, v in sorted(want.items())
    ]


# --------------------------------------------------------------------------
# fold_components reference model
# --------------------------------------------------------------------------


def _cc(edges):
    """Min-label connected components via union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in edges:
        union(u, v)
    return {n: find(n) for n in list(parent)}


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0, max_size=60,
    ),
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1, max_size=40,
    ),
)
def test_star_contraction_fold_equals_scratch(base, delta):
    base = [e for e in base if e[0] != e[1]]
    delta = [e for e in delta if e[0] != e[1]]
    base_labels = _cc(base)
    stars = list(base_labels.items())
    folded = _cc(stars + delta)
    scratch = _cc(base + delta)
    # same node universe (base nodes enter via stars) and identical
    # min-label canonical labeling — the fold_components claim
    assert folded == scratch
