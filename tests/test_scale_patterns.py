"""Scale-pattern contracts: exactly-once sinks, partition pruning,
IVF recall."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import similarity
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.sinks import (
    replicated_exactly_once,
)


def test_exactly_once_sink_tolerates_replay(spark, tmp_path):
    """Replaying the same micro-batch (same batch_id) must not duplicate
    rows — the foreachBatch idempotency pattern for file/table targets."""
    out = str(tmp_path / "repl")
    batch = spark.sql(
        "SELECT CAST(id AS STRING) AS sequenceNumber, 'x' AS payload "
        "FROM range(100)"
    )
    replicated_exactly_once(batch, out, batch_id=7)
    replicated_exactly_once(batch, out, batch_id=7)  # WAL replay
    replicated_exactly_once(batch, out, batch_id=8)  # next batch
    got = spark.read.option("basePath", out).parquet(out)
    assert got.count() == 200
    assert got.where(F.col("batch_id") == 7).count() == 100


def test_exactly_once_mode_in_streaming_job(spark, sf_dir, tmp_path):
    """The job's exactly_once flag: output readable with batch_id
    partitions, counts equal the default append mode's."""
    from aws_kinesis_data_streams_replicator_spark.sources.envelope import (
        envelope_from_events,
    )
    from aws_kinesis_data_streams_replicator_spark.streaming.job import (
        run_replication_stream,
    )
    from aws_kinesis_data_streams_replicator_spark.streaming.source import (
        read_envelope_stream,
        stage_envelope_files,
    )

    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(400)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=2)
    cfg = spark.sql(
        "SELECT * FROM VALUES ('kds-click','us-east-1'), ('kds-view','US-EAST-1') "
        "AS t(streamName, activeRegion)"
    )
    out = str(tmp_path / "out")
    q = run_replication_stream(
        read_envelope_stream(spark, stage),
        cfg,
        "us-east-1",
        replicated_dir=os.path.join(out, "repl"),
        checkpoint_table_dir=os.path.join(out, "cp"),
        stream_checkpoint_dir=os.path.join(out, "wal"),
        exactly_once=True,
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    got = spark.read.option("basePath", os.path.join(out, "repl")).parquet(
        os.path.join(out, "repl")
    )
    assert "batch_id" in got.columns
    assert got.select("batch_id").distinct().count() == 2
    from aws_kinesis_data_streams_replicator_spark.operators import replication

    want = replication.gate_active_region(
        replication.with_decoded(env), cfg, "us-east-1"
    ).count()
    assert got.count() == want


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned layout + date filter ⇒ the scan must prune at
    the partition level (PartitionFilters), not post-filter rows."""
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(out)
    )
    df = spark.read.parquet(out).where(F.col("day") == "2024-01-05")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    want = events.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
    assert df.count() == want and want > 0


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with 4-of-16 probes must recover a reasonable fraction of the
    exact top-10 (random 64-dim data is a worst case for IVF; the
    contract here is 'plausible recall + exact scoring of candidates')."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    ivf = similarity.ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4)
    hits = exact.join(ivf, ["query_id", "neighbor_id"], "inner").count()
    total = exact.count()
    assert total == 100
    assert hits / total >= 0.15, f"IVF recall collapsed: {hits}/{total}"
    # scores of returned candidates are EXACT (same quantized dot)
    joined = exact.alias("e").join(
        ivf.alias("i"), ["query_id", "neighbor_id"]
    )
    assert joined.where(F.col("e.dot_q") != F.col("i.dot_q")).count() == 0


def test_kmeans_ivf_recall_at_least_matches_heuristic_cells(spark, sf_dir):
    """k-means-trained centroids (fixed seed) must give the IVF search at
    least comparable recall to the first-N-by-id heuristic, with exact
    candidate scoring either way."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    cent = similarity.kmeans_centroids(emb, n_cells=16, seed=42)
    assert cent.count() == 16
    ivf = similarity.ivf_topk(emb, queries, k=10, n_probe=4, centroids=cent)
    heur = similarity.ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4)
    hits = exact.join(ivf, ["query_id", "neighbor_id"], "inner").count()
    heur_hits = exact.join(heur, ["query_id", "neighbor_id"], "inner").count()
    total = exact.count()
    assert total == 100
    assert hits / total >= 0.15, f"kmeans-IVF recall collapsed: {hits}/{total}"
    assert hits >= heur_hits * 0.8, (hits, heur_hits)


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a filter on the DIMENSION side must prune the partitioned
    fact scan at runtime (the star-join pattern where the fact filter is
    only known after the dim filter runs).  The plan must carry a
    dynamicpruning subquery on the fact's partition column."""
    events = load_table(spark, sf_dir, "events")
    fact_dir = str(tmp_path / "events_by_type")
    events.write.partitionBy("event_type").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # the dim must be a REAL relation: an inline VALUES + filter is
    # constant-folded to a LocalRelation before the PartitionPruning
    # rule looks for a selective predicate, so DPP would never fire
    dim_dir = str(tmp_path / "type_dim")
    spark.sql(
        "SELECT * FROM VALUES ('click', 1), ('view', 0), ('purchase', 0), "
        "('signup', 0), ('error', 0) AS d(event_type, is_target)"
    ).write.parquet(dim_dir)
    dim = spark.read.parquet(dim_dir)
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false"
    )
    try:
        joined = fact.join(dim, "event_type").where(F.col("is_target") == 1)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        want = events.where(F.col("event_type") == "click").count()
        assert joined.count() == want and want > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev
        )


def test_pq_adc_recall_vs_exact(spark, sf_dir):
    """PQ-ADC top-10 must recover a reasonable fraction of the exact
    top-10 (8×16 heuristic codebooks on random 64-dim data — a stress
    case; the contract is plausible recall + deterministic output), and
    its encoding must emit exactly n_sub codes per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    pq = similarity.pq_adc_topk(emb, queries, k=10, n_sub=8, n_cent=16)
    hits = exact.join(pq, ["query_id", "neighbor_id"], "inner").count()
    total = exact.count()
    assert total == 100
    assert hits / total >= 0.15, f"PQ recall collapsed: {hits}/{total}"
    cb = similarity.pq_codebooks(emb, 8, 16)
    assert cb.count() == 8 * 16
    codes = similarity.pq_encode(emb, cb, 8)
    n_vec = emb.count()
    assert codes.count() == n_vec * 8
    assert codes.groupBy("vec_id").count().where("count <> 8").count() == 0
