"""Hilbert-ordered write (layout.write_hilbert_ordered): the physical
half of the Hilbert family.  Same contract as the z-order write tests
— footer min-max stats must let a 2-D box predicate skip far more
files than a single-column linear sort — plus data preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators.layout import (
    write_hilbert_ordered,
)
from test_zorder_layout import _candidate_files


def test_hilbert_write_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", F.col("value").alias("v")
    )
    hpath, lpath = str(tmp_path / "hilbert"), str(tmp_path / "linear")
    write_hilbert_ordered(events, hpath, "user_id", "v", n_files=16, bits=8)
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
    h_hits, h_total = _candidate_files(
        hpath, "user_id", u_lo, u_hi, "v", v_lo, v_hi
    )
    l_hits, l_total = _candidate_files(
        lpath, "user_id", u_lo, u_hi, "v", v_lo, v_hi
    )
    assert h_total >= 8 and l_total >= 8
    # linear prunes on user_id only; the curve layout prunes on both.
    # File counts differ between the two writes (range partitioning
    # drops empty splits), so compare the touched FRACTION,
    # cross-multiplied
    assert h_hits * l_total <= l_hits * h_total, (
        h_hits, h_total, l_hits, l_total,
    )
    assert h_hits <= h_total // 2
    # correctness: layout must not change the data
    a = spark.read.parquet(hpath).agg(F.sum("event_id"), F.count("*")).first()
    b = events.agg(F.sum("event_id"), F.count("*")).first()
    assert tuple(a) == tuple(b)
