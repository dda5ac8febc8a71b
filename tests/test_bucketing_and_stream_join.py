"""Bucketed co-located joins + stream-stream joins.

Bucketing is THE 100 TB lever for repeated fact-fact joins: both tables
pre-hashed into the same bucket layout ⇒ the join needs no Exchange at
all.  Stream-stream joins are the streaming twin of the range join.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """lineitem ⋈ orders on the bucket key: with both sides bucketed the
    executed plan must contain zero Exchange operators."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    # each session gets a fresh in-memory catalog but the managed-table
    # dirs persist on disk — clear them or saveAsTable hits
    # LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_b", "o_b"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_b")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must be shuffle-free"
        # and it still computes the right thing
        n = joined.count()
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _stage_events(spark, df, stage_dir):
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage_dir, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage_dir, "all.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_stream_join_within_time_bound(spark, sf_dir, tmp_path):
    """Purchases joined to the same user's clicks from the preceding
    30 minutes — two watermarked streams, time-bounded inner join;
    result must equal the batch join."""
    events = load_table(spark, sf_dir, "events")
    stage = str(tmp_path / "ev")
    _stage_events(spark, events, stage)

    def stream():
        return (
            spark.readStream.schema(events.schema).parquet(stage)
        )

    clicks = (
        stream().where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                F.col("event_id").alias("c_id"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream().where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("p_id", "c_id")
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = spark.sql("SELECT count(*) c FROM ssj").first().c
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = events.where(F.col("event_type") == "purchase").select("user_id", "ts")
    want = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") < F.col("ts"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
    ).count()
    assert got == want and got > 0
