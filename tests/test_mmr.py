"""Behavioral pin of similarity.mmr_topk on a handcrafted two-cluster
fixture: pure relevance ranking would take the whole near cluster
before touching the far one; MMR at λ = ½ must interleave, because the
second pick's redundancy penalty (its similarity to the first pick)
exceeds the far cluster's relevance deficit.  Also pins determinism
and the round-1 convention (max_sim_sel_q = 0).

Arithmetic of the fixture (quantized ×10⁶, dots in 10¹² units):
cluster A ≈ [9, 9] has rel ≈ 90 but intra-A similarity ≈ 161, so a
second A pick scores 90 − 161 = −71; cluster B ≈ [8, −9] has rel ≈ 80
and A↔B similarity ≈ −9, so B scores 80 − (−9) = +89 and MUST win
round 2 despite losing on relevance."""

from __future__ import annotations

import pytest

from aws_kinesis_data_streams_replicator_spark.operators import similarity

_FIXTURE_SQL = """
    SELECT vec_id, embedding FROM VALUES
      (0, array(CAST(10.0 AS FLOAT), CAST(0.0 AS FLOAT))),
      (1, array(CAST(9.0 AS FLOAT), CAST(9.0 AS FLOAT))),
      (2, array(CAST(9.0 AS FLOAT), CAST(8.9 AS FLOAT))),
      (3, array(CAST(9.0 AS FLOAT), CAST(8.8 AS FLOAT))),
      (4, array(CAST(8.0 AS FLOAT), CAST(-9.0 AS FLOAT))),
      (5, array(CAST(8.0 AS FLOAT), CAST(-8.8 AS FLOAT)))
    AS t(vec_id, embedding)
"""


def _run(spark):
    emb = spark.sql(_FIXTURE_SQL)
    out = similarity.mmr_topk(emb, query_vec_id=0, k=4, pool=5)
    return sorted(
        (r.pick_round, r.vec_id, r.rel_q, r.max_sim_sel_q)
        for r in out.collect()
    )


@pytest.fixture(scope="module")
def two_cluster_mmr(spark):
    return _run(spark)


def test_round1_is_pure_relevance_argmax(two_cluster_mmr):
    rnd1 = two_cluster_mmr[0]
    assert rnd1[0] == 1 and rnd1[1] == 1  # highest rel, tie to min id
    assert rnd1[3] == 0  # round-1 convention


def test_mmr_interleaves_clusters(two_cluster_mmr):
    picks = [v for _, v, _, _ in two_cluster_mmr]
    # relevance order alone is 1,2,3,4; MMR must jump to cluster B at
    # round 2 (the fixture makes a second A pick score −71 vs B's +89)
    assert picks[0] == 1
    assert picks[1] in (4, 5)
    # ...and all four picks cover both clusters
    assert {1, 2, 3} & set(picks) and {4, 5} & set(picks)


def test_redundancy_penalty_is_reported(two_cluster_mmr):
    # every non-first pick carries the exact max-similarity it paid
    for rnd, _vid, rel, maxsim in two_cluster_mmr[1:]:
        assert rnd > 1
        assert maxsim != 0


def test_deterministic_rerun(spark, two_cluster_mmr):
    assert _run(spark) == two_cluster_mmr
