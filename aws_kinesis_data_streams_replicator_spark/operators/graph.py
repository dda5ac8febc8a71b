"""Iterative graph analytics as DataFrame joins: PageRank.

Beyond connected components (operators/clustering.py), training-data
pipelines rank web/citation graphs to weight documents (quality
propagation, seed-set expansion).  PageRank is the canonical iterative
join: each round is one shuffle join (edges × ranks) + one aggregation,
with ``localCheckpoint`` truncating lineage exactly as in clustering.

Arithmetic is **integer-exact** (rank mass scaled to 10¹², every
division an integer floor-div) so a DuckDB oracle of chained CTEs
hash-matches; a fixed iteration count substitutes for a float
convergence test.  Dangling-node mass leaks (documented variant — the
redistribution term costs one extra 1-row broadcast per round and adds
nothing to the join shape under test).

Scale notes (100 TB): ranks and edges shuffle on the same key every
round — pre-partition both by src (bucketing) and the per-round join is
co-located; out-degrees are computed once; the iteration-N plan reads
the checkpointed iteration N-1, never the full lineage.  On a real
cluster ``localCheckpoint`` becomes reliable ``checkpoint`` so executor
loss doesn't replay all rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(id, rank_q) after ``n_iter`` rounds; rank_q is the rank scaled
    by 10¹² as int64.

    r₀ = SCALE div N;  rₖ₊₁(v) = ((100−d)·(SCALE div N)) div 100
                               + (d · Σ_{u→v} rₖ(u) div outdeg(u)) div 100
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nodes.join(F.broadcast(n)).select(
        "id", F.expr(f"{SCALE} DIV n").alias("base_r")
    ).localCheckpoint(eager=True)

    ranks = base.select("id", F.col("base_r").alias("r"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .join(outdeg, "src")
            .select("dst", F.expr("r DIV outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            base.join(contrib, base.id == contrib.dst, "left")
            .select(
                "id",
                F.expr(
                    f"(({100 - damping_pct} * base_r) DIV 100) "
                    f"+ (({damping_pct} * coalesce(c, 0L)) DIV 100)"
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", F.col("r").cast("long").alias("rank_q"))
