"""Pin similarity.ivf_probe_sweep_topk (r12: one scored superset pass)
row-identical to the per-p ivf_topk union it replaced — same
candidates, same ranks, same dots, for every probe level."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import similarity


def test_sweep_matches_per_probe_ivf_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    cells = similarity.ivf_assign_cells(emb, n_cells=16).localCheckpoint(
        eager=False
    )
    swept = {
        (r.n_probe, r.query_id, r.neighbor_id, r.dot_q, r.rank)
        for r in similarity.ivf_probe_sweep_topk(
            emb, queries, k=10, n_cells=16, probes=(1, 2, 4),
            assigned_cells=cells,
        ).collect()
    }
    ref = set()
    for p in (1, 2, 4):
        for r in similarity.ivf_topk(
            emb, queries, k=10, n_cells=16, n_probe=p, assigned_cells=cells
        ).collect():
            ref.add((p, r.query_id, r.neighbor_id, r.dot_q, r.rank))
    assert swept == ref
    assert len(swept) > 0
