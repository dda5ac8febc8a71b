"""Iterative graph analytics as DataFrame joins: PageRank, triangles.

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
    # out-degree attached ONCE (r12, guide §2.4): the per-round join
    # previously re-ran the degree aggregation + a second hash join
    # every iteration; (src, dst, outdeg) is one extra long per edge
    # in the pinned frame and each round now pays a single join
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nodes.join(F.broadcast(n)).select(
        "id", F.expr(f"{SCALE} DIV n").alias("base_r")
    ).localCheckpoint(eager=True)

    ranks = base.select("id", F.col("base_r").alias("r"))
    for _ in range(n_iter):
        contrib = (
            ew.join(ranks, ew.src == ranks.id)
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


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts: (id, n_triangles) for
    every node in at least one triangle.

    Degree-ordered wedge enumeration (the MapReduce triangle algorithm
    of Suri & Vassilvitskii): orient every undirected edge from the
    lower-ranked endpoint to the higher, rank = (degree, id).  Each
    triangle then has exactly one node with BOTH out-edges (its
    lowest-ranked vertex), so wedges are generated once per triangle
    candidate and closed with a single equi-join back to the oriented
    edge set — never an all-pairs product.

    Scale notes (100 TB): wedge count is Σ outdeg(v)², and degree
    ordering provably bounds out-degree by O(√|E|) — the hub that would
    make naive wedge generation quadratic gets rank-ordered ABOVE its
    neighbors and generates no wedges.  Three shuffles total (degree
    agg, wedge self-join, closing join); per-node counts are one final
    map-side-combined agg over closed triangles."""
    und = (
        edges.select(F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # scanned 3x: degrees, wedges, close
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): a → b  iff  (deg(a), a) < (deg(b), b)
    e = (
        und.join(deg.withColumnsRenamed({"id": "u", "deg": "du"}), "u")
        .join(deg.withColumnsRenamed({"id": "v", "deg": "dv"}), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("a"), F.col("b").alias("x"))
    e2 = e.select(F.col("a"), F.col("b").alias("y"))
    wedges = e1.join(e2, "a").where(F.col("x") < F.col("y"))
    # close the wedge: the third edge is oriented x→y or y→x; canonical
    # (min, max) on both sides makes it one equi-join
    closing = e.select(
        F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
    )
    tri = wedges.select(
        "a", F.least("x", "y").alias("x"), F.greatest("x", "y").alias("y")
    ).join(closing, ["x", "y"])
    # one Generate instead of a 3-branch union (r12, guide §2.4): the
    # union form re-executed the wedge self-join + closing join once
    # per branch — the whole triangle enumeration ran 3×
    per_node = (
        tri.select(F.explode(F.array("a", "x", "y")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return per_node


def kcore_membership(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition membership by ``rounds`` of iterative
    peeling: repeatedly drop every node whose degree among SURVIVING
    nodes is < k; what remains is the k-core — the standard density
    filter for graph-derived training corpora (nodes outside the core
    are tree-like periphery; quality-propagation and community stages
    run on the core).

    Returns one row per surviving node: ``(node, deg_in_core,
    converged)`` where deg_in_core is the degree restricted to the
    final survivor set and ``converged`` says the last two survivor
    sets were identical — the Markov-stationary convention: a fixed
    round count keeps the plan static and the oracle replayable, and
    the oracle-checked witness says the rounds sufficed (survivor sets
    only shrink, so count equality IS set equality).

    Scale notes (100 TB): each round is two hash joins of the
    symmetric edge list against the survivor frame plus one
    map-side-combined degree aggregation — the PageRank shuffle shape,
    co-locatable by bucketing both on the node key; survivor frames
    are lazily checkpointed so round N reads round N−1, never the full
    lineage.  No windows, no collects; the convergence witness is one
    1-row count cross."""
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .distinct()
    )
    # both orientations from ONE pass over the distinct edge set (r12,
    # guide §2.4): the union-of-two-selects form executed the distinct
    # aggregation twice — once per branch — before the checkpoint pinned
    # the result
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("node"), F.col("v").alias("nbr")),
                    F.struct(F.col("v").alias("node"), F.col("u").alias("nbr")),
                )
            ).alias("s")
        )
        .select("s.node", "s.nbr")
        .localCheckpoint(eager=False)  # scanned twice per round
    )
    alive = sym.select("node").distinct()
    prev = alive
    for i in range(rounds):
        prev = alive
        if i == 0:
            # round 1's survivor set is ALL nodes, so the two survivor
            # joins are identities — plain degree count, same result
            # (r12, guide §2.4)
            deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("c"))
        else:
            deg = (
                sym.join(prev, "node")
                .join(prev.withColumnRenamed("node", "nbr"), "nbr")
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("c"))
            )
        alive = deg.where(F.col("c") >= k).select("node").localCheckpoint(
            eager=False
        )
    final_deg = (
        sym.join(alive, "node")
        .join(alive.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg_in_core"))
    )
    conv = (
        prev.agg(F.count(F.lit(1)).alias("_np"))
        .crossJoin(F.broadcast(alive.agg(F.count(F.lit(1)).alias("_na"))))
        .select((F.col("_np") == F.col("_na")).alias("converged"))
    )
    return final_deg.crossJoin(F.broadcast(conv))
