"""Similarity search over the ``embeddings`` table (array<float> column).

* ``brute_force_topk`` — the exactness baseline: broadcast the query set,
  score every (query, candidate) pair JVM-side, per-query top-k via a
  ranking window.  Exact integer (quantized) dot product so results are
  engine-portable (see functions/vectors.py).
* ``lsh_bucketed_topk`` — the scale path: deterministic sign-LSH buckets
  (hyperplanes = ±1 pattern derived from md5 of the dimension index, so
  no RNG and fully reproducible), candidates restricted to queries'
  buckets, then the same exact scoring.

Scale notes (100 TB): brute force is O(|Q|·N) with N streamed — fine
when |Q| is small and broadcast; the window's per-query top-k does one
shuffle keyed by query_id (|Q| keys → use a high ``n_buckets`` and salt
if |Q| is tiny but hot).  For N in the billions, LSH cuts candidates by
~2^n_planes; increase planes with log N and probe multiple buckets
(multi-probe) to recover recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.vectors import dot_q, quantize_embedding
from .util import spread


def _quantized(embeddings: DataFrame, id_col: str) -> DataFrame:
    return spread(embeddings).select(
        F.col(id_col), quantize_embedding(F.col("embedding")).alias("qe")
    )


def group_centroids(embeddings: DataFrame, group_col: str = "label") -> DataFrame:
    """Per-group embedding centroid as exact quantized component sums:
    (group, pos, sum_q, n_vecs) with pos 1-based.

    The vector-average behind k-means seeding, per-domain drift
    monitoring, and class prototypes — emitted as (Σ quantized
    component, count) so the aggregation is exact int64 and the caller
    divides at whatever precision it wants.  posexplode + one map-side-
    combined aggregation on (group, pos): dims × |groups| output rows,
    shuffle bounded by that product, never by N.
    """
    q = spread(embeddings).select(
        F.col(group_col),
        F.posexplode(quantize_embedding(F.col("embedding"))).alias("pos0", "q"),
    )
    return (
        q.select(group_col, (F.col("pos0") + 1).cast("long").alias("pos"), "q")
        .groupBy(group_col, "pos")
        .agg(
            F.sum("q").cast("long").alias("sum_q"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k by quantized dot product.

    Ties broken by neighbor id — fully deterministic.  Self-matches
    (query_id == neighbor id) are excluded.
    """
    cand = _quantized(embeddings, id_col)
    qs = _quantized(queries, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qe").alias("q_qe")
    )
    scored = cand.join(F.broadcast(qs), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        dot_q(F.col("q_qe"), F.col("qe"), dim).alias("dot_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "rank")
    )


def sign_lsh_bucket(qe_col, n_planes: int = 8, dim: int = 64, plane_offset: int = 0):
    """Deterministic sign-LSH bucket id (string of n_planes sign bits).

    Plane p's weight for dimension d is +1 if md5('<p>|<d>') starts with
    a hex char >= '8' else -1 — reproducible everywhere, no RNG.
    ``plane_offset`` selects a disjoint plane range so banded schemes can
    derive independent buckets from one hash family.
    """
    import hashlib

    bits = []
    for p in range(plane_offset, plane_offset + n_planes):
        signs = [
            1 if hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0] >= "8" else -1
            for d in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                qe_col,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _ivf_default_centroids(
    embeddings: DataFrame, n_cells: int, id_col: str
) -> DataFrame:
    """Deterministic default coarse quantizer: the first ``n_cells``
    vectors by id (cheap, replayable by the DuckDB oracles)."""
    return _quantized(embeddings.orderBy(id_col).limit(n_cells), id_col).select(
        F.col(id_col).alias("cell"), F.col("qe").alias("c_qe")
    )


def _cells_onerow(cent: DataFrame) -> DataFrame:
    """The whole centroid relation as ONE row: a cell-ascending
    array<struct<cell,c_qe>> (array_sort orders by the first struct
    field; cell ids are unique).  Centroid sets are bounded (≤ a few
    thousand at any corpus size) so the single row is KBs."""
    return cent.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cell"), F.col("c_qe")))
        ).alias("_cents")
    )


def _argmax_cell(vec_col: str) -> Column:
    """Per-row nearest-cell id against the 1-row ``_cents`` array:
    ``array_max`` over struct(dot, −cell) reproduces the exact
    (dot desc, cell asc) tie rule of the old max(struct) aggregation.

    The ``coalesce(…, -1)`` makes the expression NON-NULLABLE (the
    argmax is null only for an empty centroid set, which only happens
    on an empty corpus): downstream equi-joins on the cell id otherwise
    infer an ``isnotnull(<argmax>)`` filter that is pushed below the
    projection and re-evaluates the whole 16-dot expression once more
    per row (higher-order functions get no codegen and no CSE)."""
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                dot_q(F.col(vec_col), c["c_qe"]).alias("d"),
                (-c["cell"]).alias("nc"),
            ),
        )
    )
    return F.coalesce(-best["nc"], F.lit(-1).cast("long"))


def _assign_cells(
    df: DataFrame, cent: DataFrame, vec_col: str, n_keep: int, out: str
) -> DataFrame:
    """Nearest-cell assignment against a broadcast centroid relation.

    r12 (guide §2.4): the centroids cross the join as ONE array row and
    the argmax is a per-row expression — the old shape (keyless
    broadcast join expanding every vector to N·n_cells rows, then a
    max(struct) hash aggregation keyed by vector id) shuffled the whole
    quantized corpus once per assignment pass; this shuffles nothing.
    Same exact-integer dots, same (dot desc, cell asc) tie rule.
    """
    withc = df.crossJoin(F.broadcast(_cells_onerow(cent)))
    if n_keep == 1:
        return withc.select(*df.columns, _argmax_cell(vec_col).alias(out))
    # multi-probe (n_keep > 1): explode the centroid array back to rows
    # (the probing side is the bounded QUERY set) and keep the ranking
    # window — partition by the id column only (first col); the vector
    # array is functionally dependent and hashing it as a key is wasted
    scored = withc.select(
        *df.columns, F.explode("_cents").alias("_c")
    ).select(
        *df.columns,
        F.col("_c.cell").alias("cell"),
        dot_q(F.col(vec_col), F.col("_c.c_qe")).alias("_cd"),
    )
    w = Window.partitionBy(df.columns[0]).orderBy(
        F.col("_cd").desc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n_keep)
        .select(*df.columns, F.col("cell").alias(out))
    )


def ivf_assign_cells(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The database-side cell assignment (id, qe, cell) on its own —
    what a real IVF index stores.  Compute it ONCE (optionally behind a
    lazy localCheckpoint) and pass it to several ``ivf_topk`` calls via
    ``assigned_cells`` when sweeping n_probe or serving many query
    batches: the assignment is n_probe-independent, so recomputing it
    per sweep point is pure waste (it is the most expensive stage —
    N·n_cells dot products)."""
    cent = (
        centroids
        if centroids is not None
        else _ivf_default_centroids(embeddings, n_cells, id_col)
    )
    return _assign_cells(_quantized(embeddings, id_col), cent, "qe", 1, "cell")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assigned_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors into cells, probe
    only the query's ``n_probe`` nearest cells.

    Default centroids are the first ``n_cells`` vectors by id —
    deterministic and cheap; pass ``centroids=kmeans_centroids(...)``
    (cell, c_qe) for trained cells.  The centroid set is tiny by design
    (≤ a few thousand at any scale) so broadcasting it is free; the
    candidate search is an equi-join on cell id — the same shuffle shape
    as the LSH variant, with recall tuned by n_probe instead of plane
    count.  ``assigned_cells`` (from :func:`ivf_assign_cells`) skips the
    database-side assignment — pass it when calling more than once over
    the same corpus (probe sweeps, query batches).
    """
    cent = (
        centroids
        if centroids is not None
        else _ivf_default_centroids(embeddings, n_cells, id_col)
    )
    cand_cells = (
        assigned_cells
        if assigned_cells is not None
        else _assign_cells(_quantized(embeddings, id_col), cent, "qe", 1, "cell")
    )

    def assign(df: DataFrame, vec_col: str, n_keep: int, out: str) -> DataFrame:
        return _assign_cells(df, cent, vec_col, n_keep, out)
    qs = _quantized(queries, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qe").alias("q_qe")
    )
    q_cells = assign(qs, "q_qe", n_probe, "cell")
    scored = cand_cells.join(F.broadcast(q_cells), "cell").where(
        F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        dot_q(F.col("q_qe"), F.col("qe")).alias("dot_q"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "rank")
    )


def ivf_probe_sweep_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    probes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assigned_cells: DataFrame | None = None,
) -> DataFrame:
    """The n_probe sweep as ONE candidate pass (r12, guide §2.4):
    score the max(probes) superset once, carrying each probed cell's
    rank, and derive every sweep point by filtering ``rank <= p`` —
    bit-identical to calling :func:`ivf_topk` per p (each vector is
    assigned to exactly one cell, so a candidate's probe rank is
    unique and its dot product is probe-independent), at one
    candidate join + scoring stage instead of ``len(probes)``.

    Returns (n_probe, query_id, neighbor_id, dot_q, rank) — the union
    of the per-p ``ivf_topk`` outputs tagged with the probe count.
    """
    pmax = max(probes)
    cent = (
        centroids
        if centroids is not None
        else _ivf_default_centroids(embeddings, n_cells, id_col)
    )
    cand_cells = (
        assigned_cells
        if assigned_cells is not None
        else _assign_cells(_quantized(embeddings, id_col), cent, "qe", 1, "cell")
    )
    qs = _quantized(queries, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qe").alias("q_qe")
    )
    # multi-probe assignment with the rank KEPT (the _assign_cells
    # n_keep>1 branch drops it); the centroids cross as the same 1-row
    # array the corpus assignment uses, so the centroid chain is built
    # once per query plan (reused broadcast) instead of per consumer
    qscored = qs.crossJoin(F.broadcast(_cells_onerow(cent))).select(
        "query_id",
        "q_qe",
        F.explode("_cents").alias("_c"),
    ).select(
        "query_id",
        "q_qe",
        F.col("_c.cell").alias("cell"),
        dot_q(F.col("q_qe"), F.col("_c.c_qe")).alias("_cd"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cd").desc(), F.col("cell").asc()
    )
    q_cells = (
        qscored.withColumn("_pr", F.row_number().over(wq))
        .where(F.col("_pr") <= pmax)
        .select("query_id", "q_qe", "cell", "_pr")
    )
    probes_arr = F.array(*[F.lit(int(p)) for p in sorted(probes)])
    scored = (
        cand_cells.join(F.broadcast(q_cells), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            dot_q(F.col("q_qe"), F.col("qe")).alias("dot_q"),
            F.explode(
                F.filter(probes_arr, lambda p: p >= F.col("_pr"))
            ).alias("n_probe"),
        )
        .dropDuplicates(["n_probe", "query_id", "neighbor_id"])
    )
    wk = Window.partitionBy("n_probe", "query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("n_probe", "query_id", "neighbor_id", "dot_q", "rank")
    )


def lloyd_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed deterministic Lloyd refinement for IVF centroids —
    the oracle-checkable training path.

    ``kmeans_centroids`` below trains on a driver-side sample with
    numpy RNG (k-means++), which no SQL engine can replay.  This variant
    is exact-integer end-to-end so a DuckDB oracle reproduces it
    bit-for-bit: init = the ``n_cells`` lowest-id vectors (cell id =
    seed vector id), then ``n_iters`` rounds of (a) assign every vector
    to its max-quantized-dot centroid (ties → lowest cell — the same
    rule ``ivf_topk``'s probe uses, so train and serve agree), (b) new
    centroid component = ``sum DIV count`` (int64 sums are associative
    ⇒ partitioning-independent; DIV truncates toward zero identically
    in Spark and DuckDB).  Cells that capture no vectors keep their
    previous centroid, as in classic Lloyd.

    Scale: per iteration one broadcast join (centroids are ≤ a few KB)
    + one (cell, pos) aggregation whose cardinality is n_cells × dim —
    never O(N) shuffle rows after the map-side combine.  n_iters is a
    compile-time constant ⇒ the whole training is one static plan, no
    driver loop over actions.
    """
    # quantized-corpus lazy pin (r12, guide §5): every iteration reads
    # the corpus once and the seed TakeOrdered reads it too — without
    # the pin each read replays the scan + quantization (the
    # kcenter_coreset / matryoshka precedent: strictly bounded by the
    # embedding column's own footprint)
    cand = _quantized(embeddings, id_col).localCheckpoint(eager=False)
    cent = cand.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col("qe").alias("c_qe")
    )
    for _ in range(n_iters):
        # per-row argmax against the 1-row centroid array (r12, guide
        # §2.4): the old broadcast-join + max(struct) aggregation keyed
        # by vector id shuffled the whole quantized corpus once per
        # Lloyd round; the expression form shuffles nothing and the
        # (cell, pos) component aggregation map-side combines to
        # n_cells × dim rows before its exchange
        assigned = cand.crossJoin(F.broadcast(_cells_onerow(cent))).select(
            _argmax_cell("qe").alias("cell"), "qe"
        )
        comp = (
            assigned.select("cell", F.posexplode("qe").alias("pos0", "q"))
            .groupBy("cell", "pos0")
            .agg(F.expr("sum(q) DIV count(1)").alias("m"))
        )
        new = comp.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos0", "m"))),
                lambda s: s["m"],
            ).alias("c_qe_new")
        )
        # n_cells-row lazy pin: the round's centroids feed BOTH the
        # next round's 1-row array and the next round's fold join —
        # unpinned, the whole earlier-round chain re-executes per read
        cent = (
            cent.join(new, "cell", "left")
            .select(
                "cell", F.coalesce("c_qe_new", "c_qe").alias("c_qe")
            )
            .localCheckpoint(eager=False)
        )
    return cent


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """Train IVF centroids: sampled Lloyd k-means on the driver.

    The way production ANN indexes (faiss, ScaNN) train their coarse
    quantizers: collect a bounded deterministic sample (top-N by id —
    one TakeOrdered job), run k-means++ + Lloyd in numpy locally, and
    broadcast the tiny centroid matrix back as literal columns.  A
    distributed k-means (MLlib) costs ~15 cluster jobs for init + Lloyd
    rounds — pure overhead when the training set is a sample by
    construction; the sample bound (4096·dim floats) keeps the driver
    safe at any corpus size.  Returns (cell, c_qe) quantized exactly
    like the vectors so the existing assignment join works unchanged.
    Deterministic: fixed seed + deterministic sample (k-means|| depends
    on partitioning; this does not).
    """
    import numpy as np

    max_train = 4096
    sample = (
        embeddings.select(id_col, F.col("embedding").cast("array<double>"))
        .orderBy(id_col)
        .limit(max_train)
        .collect()
    )
    x = np.array([r[1] for r in sample])
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    centers = [x[rng.randint(len(x))]]
    for _ in range(n_cells - 1):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in centers], axis=0
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(x[rng.choice(len(x), p=probs)])
    centers = np.array(centers)
    for _ in range(10):  # Lloyd
        assign = np.argmin(
            ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        new = np.array(
            [
                x[assign == c].mean(axis=0) if (assign == c).any() else centers[c]
                for c in range(n_cells)
            ]
        )
        if np.allclose(new, centers):
            break
        centers = new
    # inline the (tiny) center matrix as literal columns over range() —
    # pure JVM, no Python workers, no extra job
    arr = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in centers[i]])
            for i in range(len(centers))
        ]
    )
    return (
        embeddings.sparkSession.range(len(centers))
        .select(F.col("id").cast("int").alias("cell"))
        .select(
            "cell",
            quantize_embedding(F.element_at(arr, F.col("cell") + 1)).alias("c_qe"),
        )
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Join is a bucket equi-join (shuffle keyed on bucket) instead of a
    cross product — the 100 TB-scale candidate generator.
    """
    cand = _quantized(embeddings, id_col).withColumn(
        "bucket", sign_lsh_bucket(F.col("qe"), n_planes, dim)
    )
    qs = (
        _quantized(queries, id_col)
        .withColumn("bucket", sign_lsh_bucket(F.col("qe"), n_planes, dim))
        .select(F.col(id_col).alias("query_id"), F.col("qe").alias("q_qe"), "bucket")
    )
    scored = cand.join(F.broadcast(qs), "bucket").where(
        F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        dot_q(F.col("q_qe"), F.col("qe"), dim).alias("dot_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "rank")
    )


def pq_codebooks(
    embeddings: DataFrame, n_sub: int = 8, n_cent: int = 16, id_col: str = "vec_id"
) -> DataFrame:
    """Product-quantization codebooks: (sub, code, c_sub) — ``n_sub``
    subspaces × ``n_cent`` centroids, each an ``dim/n_sub``-element
    quantized subvector.  Centroids are the subvectors of the first
    ``n_cent`` vectors by id (the deterministic heuristic used by
    ``ivf_topk``; swap for sampled k-means per subspace in production —
    the plan shape downstream is identical).
    """
    w = Window.orderBy(F.col(id_col).asc())
    seeds = (
        _quantized(embeddings.orderBy(id_col).limit(n_cent), id_col)
        .withColumn("code", F.row_number().over(w) - 1)
    )
    return seeds.select(
        "code",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_sub - 1)),
                lambda s: F.slice(
                    F.col("qe"),
                    (s * (F.size("qe") / n_sub).cast("int")) + 1,
                    (F.size("qe") / n_sub).cast("int"),
                ),
            )
        ).alias("sub", "c_sub"),
    ).select("sub", "code", "c_sub")


def pq_encode(
    embeddings: DataFrame, codebooks: DataFrame, n_sub: int = 8, id_col: str = "vec_id"
) -> DataFrame:
    """PQ encoding: (id, sub, code) — per subspace, the centroid with the
    minimum exact integer squared distance (ties → lowest code).

    At scale this is the memory play: ``n_sub`` single-byte codes per
    vector instead of the raw floats (64 B vs 256 B here; 32× on
    1536-dim corpora) — the index that still fits in RAM at 10⁹ vectors.
    Broadcast codebook join (n_sub·n_cent rows), argmin via one ranking
    window per (vector, subspace).
    """
    # r12 (guide §2.4): the codebook crosses the join as ONE array row
    # (sorted by (sub, code)) and the per-subspace argmin is a per-row
    # expression — the old shape (subvector posexplode → broadcast
    # codebook join → min(struct) aggregation keyed by (id, sub))
    # shuffled N·n_sub rows of the corpus once per encode; this
    # shuffles nothing.  array_min over struct(dist, code) keeps the
    # exact (dist asc, code asc) tie rule.
    q = _quantized(embeddings, id_col)
    cbarr = codebooks.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("sub"), F.col("code"), F.col("c_sub")))
        ).alias("_cb")
    )
    sublen = (F.size("qe") / n_sub).cast("int")

    def dist(c):
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("qe"), c["sub"] * sublen + 1, sublen),
                c["c_sub"],
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"),
            lambda acc, z: acc + z,
        )

    codes = F.transform(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        lambda s: F.array_min(
            F.transform(
                F.filter(F.col("_cb"), lambda c: c["sub"] == s),
                lambda c: F.struct(dist(c).alias("d"), c["code"].alias("code")),
            )
        )["code"],
    )
    return q.crossJoin(F.broadcast(cbarr)).select(
        id_col, F.posexplode(codes).alias("sub", "code")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance top-k (Jégou et al., "Product Quantization
    for Nearest Neighbor Search"): approximate dot(query, candidate) ≈
    Σ_sub dot(query_sub, centroid[sub, code(candidate, sub)]).

    The query side stays uncompressed; per query a LOOKUP TABLE of
    n_sub × n_cent partial dots is built (broadcast — tiny), and every
    candidate is scored by n_sub table lookups summed in one map-side-
    combined aggregation: no per-candidate vector math at all.  Exact
    integer arithmetic end-to-end ⇒ deterministic, oracle-checkable.
    """
    # 128-row lazy pin: the codebook feeds the encode's 1-row array AND
    # the query LUT broadcast — unpinned, the seed TakeOrdered chain
    # would execute once per consumer
    cb = pq_codebooks(embeddings, n_sub, n_cent, id_col).localCheckpoint(
        eager=False
    )
    codes = pq_encode(embeddings, cb, n_sub, id_col)
    q_subs = _quantized(queries, id_col).select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_sub - 1)),
                lambda s: F.slice(
                    F.col("qe"),
                    (s * (F.size("qe") / n_sub).cast("int")) + 1,
                    (F.size("qe") / n_sub).cast("int"),
                ),
            )
        ).alias("sub", "q_sub"),
    )
    part = F.aggregate(
        F.zip_with(F.col("q_sub"), F.col("c_sub"), lambda x, c: x * c),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    lut = q_subs.join(F.broadcast(cb), "sub").select(
        "query_id", "sub", "code", part.alias("dot_part")
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("dot_part").cast("long").alias("adc_dot_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot_q").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "adc_dot_q", "rank")
    )


def matryoshka_staged_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefix_dim: int = 16,
    n_candidates: int = 50,
    id_col: str = "vec_id",
) -> DataFrame:
    """Staged retrieval on Matryoshka-style embeddings (Kusupati et al.,
    "Matryoshka Representation Learning"): a CHEAP pass over only the
    first ``prefix_dim`` components selects ``n_candidates`` per query,
    then only those are re-scored with the full vector.

    Per-candidate work drops by dim/prefix_dim in the scan stage (4× on
    64→16 here; 96× on 1536→16 production embeddings) — the standard
    funnel when embeddings are trained coarse-to-fine.  Both stages are
    exact integer dots ⇒ fully deterministic; accuracy depends only on
    the embedding's MRL property, not on any randomness.
    """
    cand = _quantized(embeddings, id_col).localCheckpoint(eager=False)
    qs = _quantized(queries, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qe").alias("q_qe")
    )
    pre = cand.select(id_col, F.slice("qe", 1, prefix_dim).alias("pe")).join(
        F.broadcast(qs.select("query_id", F.slice("q_qe", 1, prefix_dim).alias("q_pe"))),
        F.col(id_col) != F.col("query_id"),
    ).select(
        "query_id",
        F.col(id_col),
        dot_q(F.col("q_pe"), F.col("pe")).alias("pre_dot"),
    )
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("pre_dot").desc(), F.col(id_col).asc()
    )
    shortlist = (
        pre.withColumn("_r", F.row_number().over(w_pre))
        .where(F.col("_r") <= n_candidates)
        .select("query_id", id_col)
    )
    rescored = (
        shortlist.join(cand, id_col)
        .join(F.broadcast(qs), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            dot_q(F.col("q_qe"), F.col("qe")).alias("dot_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "rank")
    )


def gram_matrix(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Exact Gram matrix of the quantized corpus: (i, j, sum_prod) for
    every dimension pair i ≤ j (1-based), sum_prod = Σ_v qe_v[i]·qe_v[j]
    in exact int64 — the Σ XᵀX statistic behind PCA / whitening /
    covariance drift monitors over embedding corpora.

    The distributed-covariance shape: each Arrow batch computes its
    dim×dim partial product with ONE numpy matmul (no per-row Python,
    no N×dim² row explosion — the naive posexplode self-join shuffles
    N·dim² rows where this shuffles ``n_batches · dim²``), and the
    final reduce is a map-side-combined sum over dim² keys.
    Quantization happens JVM-side first (functions/vectors.py), so
    Python never touches a float and engine rounding can't diverge.

    Overflow: |qe| ≤ 1e6·|x|; with |x| ≤ ~1 a partial Σ over a 10⁴-row
    batch is ≤ 10¹⁶ and int64 is safe to ~10⁹ corpus rows per batch; at
    larger scales widen the FINAL agg to decimal(38,0) — the per-batch
    matmul stays int64 either way."""
    import pandas as pd

    q = _quantized(embeddings, id_col)

    def partial_gram(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["qe"].to_numpy()).astype(np.int64)
            g = x.T @ x
            dim = g.shape[0]
            iu, ju = np.triu_indices(dim)
            yield pd.DataFrame(
                {"i": iu + 1, "j": ju + 1, "partial": g[iu, ju]}
            )

    parts = q.select("qe").mapInPandas(
        partial_gram, schema="i int, j int, partial long"
    )
    return parts.groupBy("i", "j").agg(
        F.sum("partial").cast("long").alias("sum_prod")
    )


def coreset_centroids(
    embeddings: DataFrame, k: int = 8, id_col: str = "vec_id"
) -> DataFrame:
    """IVF coarse-quantizer seeding from the greedy k-center coreset:
    the k farthest-first picks become the cell centroids (cell id =
    the pick's vec_id, the ``_ivf_default_centroids`` convention) —
    the cross-shard index-maintenance path: coresets are tiny (k
    rows), so per-shard coresets can be shipped, unioned, and
    re-coreset-ed without touching shard data, and the 2-approx
    coverage radius bounds how far any vector sits from its cell.
    Deterministic end-to-end, so a SQL oracle replays the seeding."""
    picks = kcenter_coreset(embeddings, k).select(id_col)
    e = _quantized(embeddings, id_col)
    # k-row pin (r12, guide §5): IVF consumers read the centroid set
    # at least twice (corpus assignment + query assignment); unpinned,
    # each read replays the pick join against the corpus
    return (
        e.join(F.broadcast(picks), id_col)
        .select(F.col(id_col).alias("cell"), F.col("qe").alias("c_qe"))
        .localCheckpoint(eager=False)
    )


def coverage_radius(
    embeddings: DataFrame, pick_ids: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """1-row coverage audit of a pick set: max over the corpus of the
    min exact squared L2 distance to any pick — the number a coreset's
    guarantee is ABOUT, computed independently of how the picks were
    chosen (so it audits folded/shipped coresets, not just fresh ones).

    Scale notes: picks are tiny (k rows) and cross the join as ONE
    array row (r12, guide §2.4): the per-vector min distance is a
    per-row ``array_min`` expression, so the whole audit is a single
    map-side-combined global max — the old shape (k-way broadcast
    cross then a min aggregation keyed by vector id) shuffled the
    corpus once just to fold the k distances."""
    from ..functions.vectors import sqdist_q

    e = _quantized(embeddings, id_col)
    picks = (
        e.join(F.broadcast(pick_ids.select(id_col)), id_col)
        .agg(F.collect_list(F.col("qe")).alias("_ps"))
    )
    mind = F.array_min(
        F.transform(F.col("_ps"), lambda p: sqdist_q(F.col("qe"), p))
    )
    return (
        e.crossJoin(F.broadcast(picks))
        .select(mind.alias("mind"))
        .agg(F.max("mind").cast("long").alias("cover_q"))
    )


def kcenter_coreset(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Greedy farthest-first (Gonzalez) k-center coreset selection —
    the diverse-subset primitive of training-data curation: pick k
    vectors such that every corpus vector is within the returned
    ``radius_q`` of some pick (a 2-approximation of the optimal
    k-center radius, the classical guarantee).

    Deterministic and integer-exact: quantized vectors, exact int64
    squared L2 (functions/vectors.py ``sqdist_q``), seed = smallest
    vec_id, each round's pick = argmax of the running min-distance
    with ties to the smallest vec_id.  Emits one row per pick
    (round, vec_id, sel_dist_q = its min-distance when picked) plus
    the final coverage radius on every row.

    Scale notes: k bounded rounds, each ONE corpus pass — the next
    center is a TakeOrdered(1) broadcast back as a 1-row cross, and
    the running min-distance folds with ``least`` under a lazy
    per-round checkpoint.  Total cost k scans of N rows; no windows,
    no pairwise N² stage.  (r12 optimization note: a per-round 1-row
    driver-collect variant — the ``kmeans_centroids`` pattern — was
    A/B'd and REJECTED: the k py4j round trips cost more than the
    broadcast builds on a warm session, 1.27 s vs 2.13 s per k=8
    chain at sf0.1 with bit-identical picks.  The MMR loop, whose
    state is a bounded ≤pool-row frame rather than a corpus pass,
    DID move driver-side — see ``mmr_topk``.)"""
    from ..functions.vectors import quantize_embedding, sqdist_q

    e = embeddings.select(
        "vec_id", quantize_embedding(F.col("embedding")).alias("qe")
    ).localCheckpoint(eager=False)
    seed = e.orderBy("vec_id").limit(1)
    cur = e.crossJoin(
        F.broadcast(seed.select(F.col("qe").alias("c_qe")))
    ).select("vec_id", "qe", sqdist_q(F.col("qe"), F.col("c_qe")).alias("mind"))
    picks = seed.select(
        F.lit(1).alias("round"),
        "vec_id",
        F.lit(0).cast("long").alias("sel_dist_q"),
    )
    for j in range(2, k + 1):
        # 1-row pin (r12, guide §5): the round's pick is read TWICE —
        # unioned into the pick list AND broadcast into the fold — and
        # each read re-ran the TakeOrdered(1) corpus scan
        nxt = cur.orderBy(F.desc("mind"), F.asc("vec_id")).limit(
            1
        ).localCheckpoint(eager=False)
        picks = picks.unionByName(
            nxt.select(
                F.lit(j).alias("round"),
                "vec_id",
                F.col("mind").cast("long").alias("sel_dist_q"),
            )
        )
        # lazy checkpoint per round: round j's min-distance frame is
        # consumed by BOTH round j+1's argmax and its fold — without
        # the pin the lineage re-executes every earlier round per
        # round (O(k²) corpus passes instead of O(k))
        cur = (
            cur.crossJoin(
                F.broadcast(nxt.select(F.col("qe").alias("c_qe")))
            )
            .select(
                "vec_id",
                "qe",
                F.least(
                    F.col("mind"), sqdist_q(F.col("qe"), F.col("c_qe"))
                ).alias("mind"),
            )
            .localCheckpoint(eager=False)
        )
    radius = cur.agg(F.max("mind").cast("long").alias("radius_q"))
    # pin the k-row result (r12, guide §5): the pick set is consumed
    # several times by every caller (cell seeding + radius audit +
    # fold unions), and without the pin EACH consumer replays the k
    # TakeOrdered(1) rounds over the checkpointed distance frames
    return picks.crossJoin(F.broadcast(radius)).localCheckpoint(eager=False)


def mmr_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k: rerank the
    ``pool`` most query-relevant candidates so each successive pick
    maximizes ``λ·rel − (1−λ)·max_sim_to_selected`` with λ = 1/2 — the
    standard redundancy-killer between retrieval and a context window
    (near-duplicate passages waste prompt tokens; MMR keeps the set
    relevant AND mutually distant).

    Deterministic and integer-exact: quantized vectors, exact int64
    dot products (functions/vectors.py), λ = 1/2 so the argmax of the
    MMR score equals the argmax of ``rel − max_sim`` (emitted ×2 as
    ``mmr_score2x_q``), ties to the smallest vec_id; round 1 is the
    pure-relevance argmax with ``max_sim_sel_q = 0`` by convention.

    Scale notes: the corpus pass is ONE TakeOrdered(pool) shortlist
    (never a window); the shortlist is BOUNDED by construction
    (``pool`` rows ≤ 50 of a few hundred bytes each), so it is
    collected once and the k greedy rounds run on the driver in exact
    Python int64 arithmetic — zero cluster jobs per round (the
    ``kmeans_centroids`` bounded-collect pattern; the previous
    formulation spent 2 cluster jobs per round re-ranking a ≤50-row
    frame).  The output re-enters the plan as a k-row VALUES
    relation."""
    spark = embeddings.sparkSession
    e = _quantized(embeddings, "vec_id")
    id_type = dict(e.dtypes)["vec_id"]
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("qe").alias("q_qe")
    )
    cand_rows = (
        e.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "qe", dot_q(F.col("qe"), F.col("q_qe")).alias("rel")
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(pool)
        .collect()
    )
    # driver-side greedy over the bounded pool: exact Python ints
    # reproduce the int64 plan arithmetic bit-for-bit (dots ≪ 2^63)
    cand = [
        {"vec_id": r["vec_id"], "qe": r["qe"], "rel": int(r["rel"])}
        for r in cand_rows
    ]

    def pdot(a, b) -> int:
        return sum(int(x) * int(y) for x, y in zip(a, b))

    pick_rows: list[tuple] = []
    if cand:
        sel = min(cand, key=lambda c: (-c["rel"], c["vec_id"]))
        pick_rows.append((1, sel["vec_id"], sel["rel"], 0, sel["rel"]))
        for c in cand:
            c["maxsim"] = pdot(c["qe"], sel["qe"])
            c["picked"] = c["vec_id"] == sel["vec_id"]
        for j in range(2, k + 1):
            rest = [c for c in cand if not c["picked"]]
            if not rest:
                break
            nxt = min(
                rest, key=lambda c: (-(c["rel"] - c["maxsim"]), c["vec_id"])
            )
            pick_rows.append(
                (
                    j,
                    nxt["vec_id"],
                    nxt["rel"],
                    nxt["maxsim"],
                    nxt["rel"] - nxt["maxsim"],
                )
            )
            nxt["picked"] = True
            for c in cand:
                c["maxsim"] = max(c["maxsim"], pdot(c["qe"], nxt["qe"]))
    if not pick_rows:
        return spark.range(0).select(
            F.col("id").cast("int").alias("pick_round"),
            F.col("id").cast(id_type).alias("vec_id"),
            F.col("id").cast("long").alias("rel_q"),
            F.col("id").cast("long").alias("max_sim_sel_q"),
            F.col("id").cast("long").alias("mmr_score2x_q"),
        )
    values = ", ".join(
        f"({r}, {v}, {rel}, {ms}, {sc})" for r, v, rel, ms, sc in pick_rows
    )
    return spark.sql(
        f"SELECT * FROM VALUES {values} "
        "AS t(pick_round, vec_id, rel_q, max_sim_sel_q, mmr_score2x_q)"
    ).select(
        F.col("pick_round").cast("int").alias("pick_round"),
        F.col("vec_id").cast(id_type).alias("vec_id"),
        F.col("rel_q").cast("long").alias("rel_q"),
        F.col("max_sim_sel_q").cast("long").alias("max_sim_sel_q"),
        F.col("mmr_score2x_q").cast("long").alias("mmr_score2x_q"),
    )
