"""Streaming semantic (embedding) near-dup gate: sign-LSH bucket match
against a static corpus index drops near-copies in-flight
(streaming/job.py:streaming_semantic_neardup_filter), sharing the band
family of the batch embedding LSH dedup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.dedup import (
    embedding_band_buckets,
)
from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_semantic_neardup_filter,
)

DIM = 64


def _vecs(spark, rows):
    # inline VALUES (pure JVM) — createDataFrame(py_list) would spawn
    # pickled-RDD Python workers per partition
    values = ", ".join(
        f"({i}, array({', '.join(f'CAST({x} AS FLOAT)' for x in v)}))"
        for i, v in rows
    )
    return spark.sql(
        f"SELECT * FROM VALUES {values} AS t(vec_id, embedding)"
    )


def _basis(i, scale=1.0):
    v = [0.0] * DIM
    v[i] = scale
    return v


CORPUS = [(1, _basis(0)), (2, _basis(7))]
NEW = [
    # 10 = positive scaling of corpus vec 1: identical SIGNS under every
    # hyperplane ⇒ identical bucket in every band ⇒ deterministic drop
    (10, _basis(0, scale=2.5)),
    # 11 = lives on a different axis; its sign pattern differs from both
    # corpus vectors in every band for this fixture (asserted below)
    (11, _basis(33)),
]


def test_batch_and_stream_buckets_agree(spark):
    """The static index helper and the streaming gate must bucket with
    the same family: corpus vec 1 and its positive scaling collide in
    all bands; the novel vector collides in none."""
    bands = embedding_band_buckets(
        _vecs(spark, CORPUS + NEW), n_bands=8, band_planes=8, dim=DIM
    )
    by_vec = {
        v: {(r.band_id, r.bucket) for r in rows}
        for v, rows in (
            (v, [r for r in bands.collect() if r.vec_id == v])
            for v in (1, 2, 10, 11)
        )
    }
    assert by_vec[10] == by_vec[1]
    assert not (by_vec[11] & (by_vec[1] | by_vec[2]))


def test_streaming_gate_drops_semantic_dups(spark, tmp_path):
    corpus_index = embedding_band_buckets(
        _vecs(spark, CORPUS), n_bands=8, band_planes=8, dim=DIM
    )
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    _vecs(spark, NEW).write.parquet(os.path.join(stage, "batch0"))
    stream = (
        spark.readStream.schema("vec_id int, embedding array<float>")
        .option("pathGlobFilter", "*.parquet")
        .parquet(stage + "/*")
    )
    out = streaming_semantic_neardup_filter(
        stream, corpus_index, n_bands=8, band_planes=8, dim=DIM
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sem_neardup_filtered")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {
        r.vec_id
        for r in spark.sql("SELECT * FROM sem_neardup_filtered").collect()
    }
    assert kept == {11}, kept
    # schema passthrough: the gate returns the input columns unchanged
    assert out.columns == ["vec_id", "embedding"]
