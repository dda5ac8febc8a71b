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
