"""Sketch-driven join planning (operators/costmodel.py): the CMS
join-size family consumed as a cost model.

What must hold: the grid's side cardinalities are EXACT (each key adds
1 to every row), the output bound is one-sided, the broadcast decision
follows the documented rule, and the eager ``plan_equijoin`` actually
plants the hint — a BroadcastHashJoin in the physical plan when the
build side is proven small, and a result identical to the plain join
either way."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import costmodel
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer")


def test_grid_side_cardinality_is_exact(spark, orders):
    g = costmodel.key_cms_grid(orders, "o_custkey")
    per_row = (
        g.groupBy("r").agg(F.sum("cnt").alias("n")).collect()
    )
    n = orders.count()
    assert len(per_row) == costmodel.CMS_DEPTH
    assert all(r["n"] == n for r in per_row)


def test_join_size_bound_is_one_sided(spark, orders, customer):
    pos = customer.where(F.col("c_acctbal") > 0)
    ga = costmodel.key_cms_grid(orders, "o_custkey")
    gb = costmodel.key_cms_grid(pos, "c_custkey")
    stats = costmodel.join_plan_stats(ga, gb, 5000).first()
    true_size = orders.join(
        pos, orders["o_custkey"] == pos["c_custkey"]
    ).count()
    assert stats["join_size_bound"] >= true_size
    assert stats["rows_a"] == orders.count()
    assert stats["rows_b"] == pos.count()


def test_plan_equijoin_broadcasts_proven_small_side(
    spark, orders, customer
):
    joined, stats = costmodel.plan_equijoin(
        orders, customer, "o_custkey", "c_custkey",
        broadcast_threshold_rows=100_000,
    )
    assert stats["broadcast_smaller"]
    assert stats["smaller_side"] == "b"  # customer < orders
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert joined.count() == orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()


def test_plan_equijoin_withholds_hint_over_threshold(
    spark, orders, customer
):
    joined, stats = costmodel.plan_equijoin(
        orders, customer, "o_custkey", "c_custkey",
        broadcast_threshold_rows=1,
    )
    assert not stats["broadcast_smaller"]
    # strategy is left to AQE (no hint), but the RESULT is identical
    assert joined.count() == orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
