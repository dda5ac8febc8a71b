"""Planted-outlier semantics for the exact-integer 3σ anomaly operator."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.stats import (
    sigma_outlier_counts,
)


def test_single_planted_outlier_flagged(spark):
    # 20 points at 10.0 plus one at 1000.0: μ≈57.1, 3σ≈632; only the
    # 1000.0 point deviates past it.
    vals = ", ".join(f"({i}L, 'a', 10.0D)" for i in range(20))
    df = spark.sql(
        f"SELECT * FROM VALUES {vals}, (20L, 'a', 1000.0D)"
        " AS t(event_id, event_type, value)"
    )
    r = sigma_outlier_counts(df).collect()[0]
    assert (r.n_events, r.n_outliers) == (21, 1)
    assert r.sum_cents == 20 * 1000 + 100000
    assert r.mean_cents == 120000 // 21


def test_uniform_group_has_no_outliers(spark):
    vals = ", ".join(f"({i}L, 'b', {10 + (i % 3)}.5D)" for i in range(30))
    df = spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(event_id, event_type, value)"
    )
    r = sigma_outlier_counts(df).collect()[0]
    assert r.n_outliers == 0


def test_constant_group_zero_variance(spark):
    # all-equal values: variance 0, strict > keeps every point in-band
    vals = ", ".join(f"({i}L, 'c', 5.0D)" for i in range(5))
    df = spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(event_id, event_type, value)"
    )
    r = sigma_outlier_counts(df).collect()[0]
    assert (r.n_events, r.n_outliers) == (5, 0)
