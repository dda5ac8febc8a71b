"""Streaming join-size monitor (streaming/stateful.py:
streaming_join_size_monitor): the projected |stream ⋈ dim| must never
underestimate the true join size, the budget alarm must fire exactly
when crossed, and the Python bucket function must be byte-identical to
the Spark/DuckDB batch grid convention (so state grids merge with batch
grids)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.streaming.stateful import (
    _CMS_D,
    _CMS_W,
    _cms_bucket_py,
    streaming_join_size_monitor,
)

SCHEMA = "event_type string, user_id long"


def _write_file(spark, rows_sql, stage, name):
    df = spark.sql(
        f"SELECT * FROM VALUES {rows_sql} AS t(event_type, user_id)"
    )
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stage, exist_ok=True)
    (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(src, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _dim_grid(spark, ids):
    """The batch grid rollup over a dim keyed by the given ids — the
    same expression family as agg_join_size_estimate."""
    df = spark.range(0).sparkSession.createDataFrame(
        [(str(i),) for i in ids], "k string"
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.expr(
                        f"CAST(conv(substring(md5(concat('{r}|', k)), 1, 5),"
                        f" 16, 10) AS BIGINT) % {_CMS_W}"
                    ).alias("bucket"),
                )
                for r in range(_CMS_D)
            ]
        )
    ).alias("rb")
    return (
        df.select(rows)
        .select("rb.r", "rb.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def test_python_bucket_matches_spark_convention(spark):
    keys = ["0", "7", "12345", "999999"]
    for r in (0, 3):
        got_spark = {
            row["k"]: row["b"]
            for row in spark.createDataFrame([(k,) for k in keys], "k string")
            .select(
                "k",
                F.expr(
                    f"CAST(conv(substring(md5(concat('{r}|', k)), 1, 5), "
                    f"16, 10) AS BIGINT) % {_CMS_W}"
                ).alias("b"),
            )
            .collect()
        }
        for k in keys:
            assert got_spark[k] == _cms_bucket_py(r, k), (r, k)


def test_projection_bounds_true_join_size_and_alarms(spark, tmp_path):
    stage = str(tmp_path / "stage")
    out_name = "jsz_out"
    # dim: user ids 0..499; stream batch 1: users 0..199 (each joins
    # once → true size 200); batch 2: users 0..199 again (cumulative
    # stream multiset of 400 keys → true join size 400)
    dim = _dim_grid(spark, range(500))
    _write_file(spark, ", ".join(f"('j', {i})" for i in range(200)),
                stage, "b1.parquet")
    _write_file(spark, ", ".join(f"('j', {i})" for i in range(200)),
                stage, "b2.parquet")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        streaming_join_size_monitor(stream, dim, budget=300)
        .writeStream.format("memory")
        .queryName(out_name)
        .option("checkpointLocation", str(tmp_path / "wal"))
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    rows = sorted(
        spark.sql(f"SELECT * FROM {out_name}").collect(),
        key=lambda r: r.n_seen,
    )
    assert [r.n_seen for r in rows] == [200, 400]
    b1, b2 = rows
    # one-sided: projection >= true join size; and tight-ish at this
    # load factor (400 keys into 1024 buckets): within 2x
    assert 200 <= b1.projected_join_size <= 400
    assert 400 <= b2.projected_join_size <= 800
    # budget 300: batch 1 under, batch 2 over
    assert not b1.alarm
    assert b2.alarm
