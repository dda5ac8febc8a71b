"""KMV (bottom-k) set-operation sketch: estimator accuracy watchdog.

Parity pins the ARITHMETIC (deterministic min-k + integer division);
this pytest pins that the estimates actually estimate — per-cohort and
union estimates within 4 standard errors (sigma ~ 1/sqrt(k-1) ~ 12.6%
at k=64) of exact at sf0.01, and the n<=k short-circuit collapsing to
exact at sf0.001."""

from __future__ import annotations

from conftest import SF_SMOKE

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES

SF_001 = "/root/testdata/sf0.01"


def test_short_circuit_exact_below_k(spark):
    (r,) = QUERIES["agg_kmv_set_operations"](spark, SF_SMOKE).collect()
    # sf0.001 has ~15 distinct users per cohort, far below k=64: every
    # estimate must equal its exact counterpart
    assert r.n_a_est == r.n_a_exact
    assert r.n_b_est == r.n_b_exact
    assert r.n_union_est == r.n_union_exact
    assert r.n_inter_est == r.n_inter_exact


def test_estimates_track_exact_at_sf001(spark):
    (r,) = QUERIES["agg_kmv_set_operations"](spark, SF_001).collect()
    tol = 4 / (63 ** 0.5)  # 4 sigma at k=64
    for est, exact in [
        (r.n_a_est, r.n_a_exact),
        (r.n_b_est, r.n_b_exact),
        (r.n_union_est, r.n_union_exact),
        (r.n_inter_est, r.n_inter_exact),
    ]:
        assert exact > 0
        assert abs(est - exact) <= exact * tol, (est, exact)
