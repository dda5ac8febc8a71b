"""Hilbert-curve pins.

* the pure-Python reference is a real Hilbert curve: bijective on the
  grid and every consecutive pair of indices is Manhattan-adjacent
  (the property that makes its range buckets tighter than Morton's);
* the Spark chained-projection form equals the reference;
* at a power-of-4 file count Hilbert and Morton range buckets are the
  SAME aligned square blocks (exact span tie), while at the query's
  unaligned 48 the summed spans over both interleaved dims differ
  with Hilbert ahead — the fact files_hilbert_pruning exists to show.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from aws_kinesis_data_streams_replicator_spark.operators import layout


def test_reference_is_bijective_and_adjacent():
    n = 32
    inv = {}
    for x in range(n):
        for y in range(n):
            d = layout.hilbert_index(n, x, y)
            assert 0 <= d < n * n
            assert d not in inv
            inv[d] = (x, y)
    for d in range(n * n - 1):
        x0, y0 = inv[d]
        x1, y1 = inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_spark_form_matches_reference(spark):
    pts = spark.sql(
        "SELECT (id * 37) % 256 AS x, (id * 91) % 256 AS y "
        "FROM range(0, 500)"
    )
    got = layout.with_hilbert(pts, "x", "y", out="hv", bits=8).collect()
    for r in got:
        assert r.hv == layout.hilbert_index(256, r.x, r.y), (r.x, r.y)


def _span_sums(n_files: int) -> dict:
    ctes, fin = layout.hilbert_ctes(
        "SELECT x, y, x AS hx, y AS hy FROM pts", bits=8
    )
    sql = f"""
    WITH pts AS (SELECT (i * 37) % 256 AS x, (i * 91) % 256 AS y
                 FROM range(0, 20000) t(i)),
    {", ".join(ctes)},
    hz AS (SELECT x, y, hv,
                  {layout.zvalue_sql("x", "y", bits=8, div="//")} AS zv
           FROM {fin}),
    he AS (SELECT x, y, hv * {n_files} // 65536 AS fh,
                  zv * {n_files} // 65536 AS fz FROM hz),
    st AS (SELECT 'hilbert' AS l, 'x' AS d, fh AS f, x AS v FROM he
           UNION ALL SELECT 'hilbert', 'y', fh, y FROM he
           UNION ALL SELECT 'zorder', 'x', fz, x FROM he
           UNION ALL SELECT 'zorder', 'y', fz, y FROM he),
    pf AS (SELECT l, d, f, max(v) - min(v) + 1 AS span
           FROM st GROUP BY 1, 2, 3)
    SELECT l, CAST(sum(span) AS BIGINT) AS total FROM pf GROUP BY l
    """
    return {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}


def test_power_of_four_files_tie_exactly():
    s = _span_sums(64)  # 65536 / 64 = 1024 = 4^5 cells per file
    assert s["hilbert"] == s["zorder"]


def test_unaligned_files_show_hilbert_locality_win():
    s = _span_sums(48)  # the query's file count
    assert s["hilbert"] < s["zorder"]
