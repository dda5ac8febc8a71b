"""Connected-components label propagation (operators/clustering.py)."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.clustering import (
    cluster_representatives,
    connected_components,
)


def _edges(spark, pairs):
    rows = ", ".join(f"({a}, {b})" for a, b in pairs)
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(doc_a, doc_b)")


def test_chain_converges_past_one_hop(spark):
    """A 6-node path needs multiple propagation rounds — exercises the
    iterate-to-fixpoint loop, not just one join."""
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)])
    got = {
        (r.doc_id, r.cluster_id) for r in connected_components(edges).collect()
    }
    assert got == {(i, 1) for i in range(1, 7)} | {(10, 10), (11, 10)}


def test_star_and_triangle_components(spark):
    edges = _edges(spark, [(7, 9), (8, 9), (20, 21), (21, 22), (20, 22)])
    got = {
        (r.doc_id, r.cluster_id) for r in connected_components(edges).collect()
    }
    assert got == {(7, 7), (8, 7), (9, 7), (20, 20), (21, 20), (22, 20)}


def test_cluster_representatives(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    reps = {
        (r.cluster_id, r.n_members, r.representative)
        for r in cluster_representatives(connected_components(edges)).collect()
    }
    assert reps == {(1, 3, 1), (10, 2, 10)}


def test_fold_components_equals_scratch(spark):
    """Incremental fold (clustering.fold_components) == from-scratch CC
    on the union graph, including the bridge case: one delta doc joins
    TWO old components, and both must re-canonicalize to the global
    min id without any historical edge being revisited."""
    from aws_kinesis_data_streams_replicator_spark.operators.clustering import (
        connected_components,
        fold_components,
    )

    base = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)]
    # delta: 99 bridges old components {1,2,3} and {10,11}; 30-31 is a
    # brand-new component; 22-23 extends an old chain
    delta = [(3, 99), (99, 10), (30, 31), (22, 23)]
    base_cc = connected_components(_edges(spark, base))
    folded = {
        (r["doc_id"], r["cluster_id"])
        for r in fold_components(base_cc, _edges(spark, delta)).collect()
    }
    scratch = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(_edges(spark, base + delta)).collect()
    }
    assert folded == scratch
    # the bridged mega-component canonicalized to the global min (1)
    assert (10, 1) in folded and (99, 1) in folded and (11, 1) in folded
    assert (30, 30) in folded and (23, 20) in folded
