"""Round-2 streaming surface: transformWithState + stream-stream OUTER join.

* ``running_stream_totals_tws`` (transformWithStateInPandas) must produce
  the same final per-stream totals as the applyInPandasWithState twin.
* Left-outer stream-stream join: null rows for unmatched left rows are
  emitted ONLY once the watermark passes the join window — asserted by
  stepping the file source batch-by-batch.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import replication
from aws_kinesis_data_streams_replicator_spark.sources.envelope import (
    envelope_from_events,
)
from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table
from aws_kinesis_data_streams_replicator_spark.streaming.source import (
    read_envelope_stream,
    stage_envelope_files,
)
from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    running_stream_totals_ttl,
    running_stream_totals_tws,
)


def test_transform_with_state_plan_builds(spark, sf_dir, tmp_path):
    """Plan construction needs no protobuf: the analyzed plan must carry
    the TransformWithStateInPySpark operator with our output schema."""
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(50)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=1)
    decoded = replication.with_decoded(read_envelope_stream(spark, stage))
    out = running_stream_totals_tws(decoded)
    assert out.schema.simpleString() == (
        "struct<streamName:string,total_records:bigint,"
        "last_commit_ts:string,n_batches:bigint>"
    )
    assert "transformWithState" in out._jdf.queryExecution().analyzed().toString()


def test_transform_with_state_ttl_plan_builds(spark, sf_dir, tmp_path):
    """TTL variant: same output schema, ProcessingTime time mode (TTL is
    wall-clock), and the TTL config reaches the ValueState handle (plan
    construction validates the processor's init against the real API, so
    a bad ttlDurationMs kwarg would fail here, protobuf or not)."""
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(50)
    stage = str(tmp_path / "stage-ttl")
    stage_envelope_files(env, stage, n_files=1)
    decoded = replication.with_decoded(read_envelope_stream(spark, stage))
    out = running_stream_totals_ttl(decoded, ttl_ms=5_000)
    assert out.schema.simpleString() == (
        "struct<streamName:string,total_records:bigint,"
        "last_commit_ts:string,n_batches:bigint>"
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "transformWithState" in plan and "ProcessingTime" in plan


def test_transform_with_state_matches_apply_in_pandas_with_state(
    spark, sf_dir, tmp_path
):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf, "
        "absent from this container (pip install forbidden) — the operator "
        "is exercised end-to-end wherever pyspark[connect] deps exist",
    )
    env = envelope_from_events(load_table(spark, sf_dir, "events")).limit(600)
    stage = str(tmp_path / "stage")
    stage_envelope_files(env, stage, n_files=3)

    stream = read_envelope_stream(spark, stage, max_batches_per_trigger=1)
    decoded = replication.with_decoded(stream)
    q = (
        running_stream_totals_tws(decoded)
        .writeStream.format("memory")
        .queryName("totals_tws")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    rows = spark.sql(
        """
        SELECT streamName, total_records, last_commit_ts, n_batches
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY streamName ORDER BY n_batches DESC) AS rk
            FROM totals_tws
        ) WHERE rk = 1
        """
    ).collect()
    got = {r.streamName: (r.total_records, r.last_commit_ts) for r in rows}
    want = {
        r.streamName: (r.n, r.last_ts)
        for r in replication.with_decoded(env)
        .groupBy("streamName")
        .agg(F.count("*").alias("n"), F.max("commitTimestamp").alias("last_ts"))
        .collect()
    }
    assert got == want
    assert any(r.n_batches > 1 for r in rows), "state must span micro-batches"


def _write_one_file(spark, sql_values, schema, stage_dir, name):
    cols = ", ".join(c.strip().split()[0] for c in schema.split(","))
    df = spark.sql(f"SELECT * FROM VALUES {sql_values} AS t({cols})")
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage_dir, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(
    spark, tmp_path
):
    """Purchases LEFT OUTER JOIN clicks (same user, click in the 30 min
    before the purchase).  The unmatched purchase must appear with a null
    click id only AFTER later data advances the watermark past its join
    window — never in the same batch."""
    l_stage, r_stage = str(tmp_path / "l"), str(tmp_path / "r")
    # batch 1: P1 has a matching click; P2 has none.
    _write_one_file(
        spark,
        "(1, TIMESTAMP '2024-01-01 10:00:00', 101), "
        "(2, TIMESTAMP '2024-01-01 10:05:00', 102)",
        "user_id INT, p_ts TIMESTAMP, p_id INT",
        l_stage,
        "b1.parquet",
    )
    _write_one_file(
        spark,
        "(1, TIMESTAMP '2024-01-01 09:50:00', 201)",
        "c_user INT, c_ts TIMESTAMP, c_id INT",
        r_stage,
        "b1.parquet",
    )

    left_schema = "user_id INT, p_ts TIMESTAMP, p_id INT"
    right_schema = "c_user INT, c_ts TIMESTAMP, c_id INT"
    purchases = (
        spark.readStream.schema(left_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(l_stage)
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        spark.readStream.schema(right_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(r_stage)
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select("p_id", "c_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssoj")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    first = {(r.p_id, r.c_id) for r in spark.sql("SELECT * FROM ssoj").collect()}
    assert (101, 201) in first
    assert (102, None) not in first, "null must wait for the watermark"

    # batch 2: far-future rows on BOTH sides push the watermark past
    # P2's window, forcing the unmatched-left emission.
    _write_one_file(
        spark,
        "(9, TIMESTAMP '2024-01-01 12:00:00', 900)",
        "user_id INT, p_ts TIMESTAMP, p_id INT",
        l_stage,
        "b2.parquet",
    )
    _write_one_file(
        spark,
        "(9, TIMESTAMP '2024-01-01 12:00:00', 901)",
        "c_user INT, c_ts TIMESTAMP, c_id INT",
        r_stage,
        "b2.parquet",
    )
    deadline = time.time() + 60
    final = set()
    while time.time() < deadline:
        q.processAllAvailable()
        final = {(r.p_id, r.c_id) for r in spark.sql("SELECT * FROM ssoj").collect()}
        if (102, None) in final:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    assert (102, None) in final, f"unmatched left row never emitted: {final}"
    assert (101, 201) in final


def test_stream_stream_full_outer_join_emits_nulls_both_sides(
    spark, tmp_path
):
    """Purchases FULL OUTER JOIN clicks: after the watermark passes, an
    unmatched purchase emits (p_id, null) AND an unmatched click emits
    (null, c_id) — both sides' state is evictable, which is what makes
    the full-outer form runnable on unbounded streams at all."""
    l_stage, r_stage = str(tmp_path / "l"), str(tmp_path / "r")
    # batch 1: P1/C1 match; P2 unmatched purchase; C2 unmatched click.
    _write_one_file(
        spark,
        "(1, TIMESTAMP '2024-01-01 10:00:00', 101), "
        "(2, TIMESTAMP '2024-01-01 10:05:00', 102)",
        "user_id INT, p_ts TIMESTAMP, p_id INT",
        l_stage,
        "b1.parquet",
    )
    _write_one_file(
        spark,
        "(1, TIMESTAMP '2024-01-01 09:50:00', 201), "
        "(3, TIMESTAMP '2024-01-01 09:55:00', 202)",
        "c_user INT, c_ts TIMESTAMP, c_id INT",
        r_stage,
        "b1.parquet",
    )
    purchases = (
        spark.readStream.schema("user_id INT, p_ts TIMESTAMP, p_id INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(l_stage)
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        spark.readStream.schema("c_user INT, c_ts TIMESTAMP, c_id INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(r_stage)
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "fullOuter",
    ).select("p_id", "c_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssfoj")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    first = {(r.p_id, r.c_id) for r in spark.sql("SELECT * FROM ssfoj").collect()}
    assert (101, 201) in first
    assert (102, None) not in first and (None, 202) not in first, (
        "outer nulls must wait for the watermark"
    )

    # batch 2: far-future rows on both sides advance the watermark.
    _write_one_file(
        spark,
        "(9, TIMESTAMP '2024-01-01 12:00:00', 900)",
        "user_id INT, p_ts TIMESTAMP, p_id INT",
        l_stage,
        "b2.parquet",
    )
    _write_one_file(
        spark,
        "(9, TIMESTAMP '2024-01-01 12:00:00', 901)",
        "c_user INT, c_ts TIMESTAMP, c_id INT",
        r_stage,
        "b2.parquet",
    )
    deadline = time.time() + 60
    final = set()
    while time.time() < deadline:
        q.processAllAvailable()
        final = {
            (r.p_id, r.c_id) for r in spark.sql("SELECT * FROM ssfoj").collect()
        }
        if (102, None) in final and (None, 202) in final:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    assert (102, None) in final, f"unmatched purchase never emitted: {final}"
    assert (None, 202) in final, f"unmatched click never emitted: {final}"
    assert (101, 201) in final
