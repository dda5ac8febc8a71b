"""Streaming record-linkage gate (streaming/job.py:
streaming_linkage_gate): incoming records classified against a static
entity index inside foreachBatch — matched records carry the entity id,
unmatched ones pass through with matched=false; a WAL restart reprocesses
nothing (stateless gate, offsets only)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.streaming.job import (
    streaming_linkage_gate,
)

SCHEMA = "entity long, block long, name_norm string"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} AS t(entity, block, name_norm)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _agreements():
    # built lazily: F.col needs an active session in this PySpark build
    return [("name", F.col("name_norm_a") == F.col("name_norm_b"), 50)]


def test_gate_classifies_against_static_index(spark, tmp_path):
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    # entity index: two golden entities in two blocks
    index = spark.sql(
        "SELECT * FROM VALUES (100, 1, 'alice'), (200, 2, 'bob') "
        "AS t(entity, block, name_norm)"
    )
    # batch 1: record 1 matches alice; record 2 same block, wrong name;
    # batch 2: record 3 has no index block at all (left join → null)
    _write_file(
        spark, "(1, 1, 'alice'), (2, 1, 'zed')", stage, "b1.parquet"
    )
    _write_file(spark, "(3, 9, 'carol')", stage, "b2.parquet")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def sink(batch_df, batch_id):
        streaming_linkage_gate(
            batch_df, index, _agreements(), match_threshold=50
        ).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "wal"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    rows = {r["entity"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["matched"] and rows[1]["matched_entity"] == 100
    assert rows[1]["score"] == 50
    assert not rows[2]["matched"] and rows[2]["matched_entity"] is None
    # no index entry in the record's block: left join yields no
    # agreements, so the score is 0 (not null) and the gate passes the
    # record through unmatched
    assert not rows[3]["matched"] and rows[3]["score"] == 0


def test_gate_picks_best_match_deterministically(spark):
    # two index entities in the record's block, one agreeing on name:
    # the agreeing one must win regardless of index order
    index = spark.sql(
        "SELECT * FROM VALUES (300, 5, 'dora'), (100, 5, 'dan') "
        "AS t(entity, block, name_norm)"
    )
    rec = spark.sql(
        "SELECT * FROM VALUES (7, 5, 'dan') AS t(entity, block, name_norm)"
    )
    got = streaming_linkage_gate(
        rec, index, _agreements(), match_threshold=50
    ).collect()
    assert len(got) == 1
    assert got[0]["matched_entity"] == 100 and got[0]["score"] == 50


def test_gate_tie_breaks_to_smallest_entity(spark):
    # two index entities BOTH agreeing on name (equal score): the
    # documented contract picks the SMALLEST entity id, regardless of
    # index order (r7 ADVICE: the old struct-max picked the largest)
    index = spark.sql(
        "SELECT * FROM VALUES (300, 5, 'eve'), (100, 5, 'eve') "
        "AS t(entity, block, name_norm)"
    )
    rec = spark.sql(
        "SELECT * FROM VALUES (7, 5, 'eve') AS t(entity, block, name_norm)"
    )
    got = streaming_linkage_gate(
        rec, index, _agreements(), match_threshold=50
    ).collect()
    assert len(got) == 1
    assert got[0]["matched_entity"] == 100 and got[0]["score"] == 50
