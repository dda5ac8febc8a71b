"""Z-order layout arithmetic (operators/layout.py): the Morton
interleave against a bit-twiddling reference, bucket-rule exactness,
and the pruning-stats contract on a frame small enough to verify by
hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import layout


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_bit_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "zv", layout.zvalue("x", "y")
    )
    for r in df.collect():
        assert r["zv"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue_locality_beats_concatenation(spark):
    """The point of the interleave: z-sorting gives BOTH dims
    locality.  Sorting by (x, y) concatenation gives y none — verify
    on an 8x8 grid split into 4 z-range buckets that every bucket's y
    span is half the domain (a quadrant), where x-major sorting
    yields full-domain y spans."""
    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "zv", layout.zvalue("x", "y", bits=3)
    )
    b = df.withColumn(
        "bucket", F.expr(layout.range_bucket_sql("zv", "64", 4))
    )
    spans = {
        r["bucket"]: r["span"]
        for r in b.groupBy("bucket")
        .agg((F.max("y") - F.min("y") + 1).alias("span"))
        .collect()
    }
    assert len(spans) == 4
    assert all(s == 4 for s in spans.values())  # quadrants: half of 8


def test_range_bucket_sql_is_exact_integer_division(spark):
    df = spark.range(1000).select(F.col("id").alias("v"))
    got = df.select(
        F.expr(layout.range_bucket_sql("v", "1000", 7)).alias("b")
    ).collect()
    assert [r["b"] for r in got] == [i * 7 // 1000 for i in range(1000)]


def test_layout_pruning_stats_hand_checked(spark):
    """4 rows, 2 files per layout: spans and the hit-rate arithmetic
    verified by hand."""
    rows = [
        # (good layout file, bad layout file, val)
        (0, 0, 10),
        (0, 1, 11),
        (1, 0, 20),
        (1, 1, 21),
    ]
    df = spark.createDataFrame(rows, "fg long, fb long, val long")
    out = {
        (r["layout"], r["dim"]): r
        for r in layout.layout_pruning_stats(
            df,
            assignments=[
                ("clustered", "v", F.col("fg"), F.col("val")),
                ("scattered", "v", F.col("fb"), F.col("val")),
            ],
            domains=["v"],
        ).collect()
    }
    g, b = out[("clustered", "v")], out[("scattered", "v")]
    # clustered: files [10,11] and [20,21] -> span_sum 4, domain 12
    assert (g["n_files"], g["span_sum"]) == (2, 4)
    assert g["expected_files_hit_bp"] == 4 * 10000 // 12
    # scattered: files [10,20] and [11,21] -> span_sum 22
    assert (b["n_files"], b["span_sum"]) == (2, 22)
    assert b["expected_files_hit_bp"] == 22 * 10000 // 12
