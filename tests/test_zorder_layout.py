"""Z-order layout: the written files must actually enable multi-column
data skipping.  We read back each parquet file's min-max footer stats
(what any stats-based pruner — Spark row-group filters, Delta/Iceberg
file skipping — consults) and count how many files a 2-D box predicate
would have to touch: the Z-ordered layout must touch far fewer than a
single-column linear sort, on BOTH dimensions."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.layout import (
    write_zordered,
    z_value,
)


def _candidate_files(path: str, x_col: str, x_lo, x_hi, y_col: str, y_lo, y_hi):
    """Files whose [min,max] ranges intersect the query box on both dims."""
    hits, total = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        xmin = ymin = None
        xmax = ymax = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == x_col:
                    xmin = st.min if xmin is None else min(xmin, st.min)
                    xmax = st.max if xmax is None else max(xmax, st.max)
                elif name == y_col:
                    ymin = st.min if ymin is None else min(ymin, st.min)
                    ymax = st.max if ymax is None else max(ymax, st.max)
        total += 1
        if xmin is None or ymin is None:
            hits += 1  # no stats → cannot skip
        elif xmax >= x_lo and xmin <= x_hi and ymax >= y_lo and ymin <= y_hi:
            hits += 1
    return hits, total


def test_z_value_interleaves_bits(spark):
    rows = spark.sql(
        "SELECT * FROM VALUES (0, 0), (1, 0), (0, 1), (3, 5) AS t(x, y)"
    ).select("x", "y", z_value(F.col("x"), F.col("y"), bits=4).alias("z"))
    got = {(r.x, r.y): r.z for r in rows.collect()}
    # x bits at even positions, y bits at odd: (3,5)=0b11,0b101 →
    # z = 1·1 + 1·4 (x) + 1·2 + 1·32 (y) = 0b100111
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 5): 39}


def test_zorder_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", F.col("value").alias("v")
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(events, zpath, "user_id", "v", n_files=16, bits=8)
    (
        events.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    stats = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("v"), F.max("v")
    ).first()
    u_lo = stats[0] + (stats[1] - stats[0]) * 2 // 5
    u_hi = stats[0] + (stats[1] - stats[0]) * 3 // 5
    v_lo = stats[2] + (stats[3] - stats[2]) * 2 / 5
    v_hi = stats[2] + (stats[3] - stats[2]) * 3 / 5
    z_hits, z_total = _candidate_files(zpath, "user_id", u_lo, u_hi, "v", v_lo, v_hi)
    l_hits, l_total = _candidate_files(lpath, "user_id", u_lo, u_hi, "v", v_lo, v_hi)
    assert z_total >= 8 and l_total >= 8
    # the linear layout prunes on user_id only → ~1/5 of files on dim 1,
    # ALL of those overlap the v box; z-order prunes on both dims.
    assert z_hits < l_hits, (z_hits, z_total, l_hits, l_total)
    assert z_hits <= z_total // 2
    # correctness: layout must not change the data
    a = spark.read.parquet(zpath).agg(F.sum("event_id"), F.count("*")).first()
    b = events.agg(F.sum("event_id"), F.count("*")).first()
    assert tuple(a) == tuple(b)


@pytest.mark.parametrize("x,y,bits,expected", [(0b1111, 0, 4, 0b01010101)])
def test_z_value_x_only(spark, x, y, bits, expected):
    row = spark.sql(f"SELECT {x} AS x, {y} AS y").select(
        z_value(F.col("x"), F.col("y"), bits).alias("z")
    ).first()
    assert row.z == expected
