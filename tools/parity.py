"""Local stand-in for the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet tables, then compares row count, column names, and the full
multiset of values EXACTLY (the driver hash-compares, so any divergence
— float rounding, timestamp formatting, hash function choice — is a
failure here too).

Usage:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from aws_kinesis_data_streams_replicator_spark.plans.queries import ORACLE_SQL, QUERIES
from aws_kinesis_data_streams_replicator_spark.sources.tables import TABLES
from aws_kinesis_data_streams_replicator_spark.session import get_spark


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        return v
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # NULL-safe sort key: (is_null, type tag, value) per cell
    def key(row):
        return tuple(
            (v is None, type(v).__name__, "" if v is None else str(v)) for v in row
        )

    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=key)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def compare_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLE_SQL:
        return True, f"rows-only ({len(s_rows)} rows)"
    res = con.execute(ORACLE_SQL[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sm = _rows_to_multiset(s_cols, s_rows)
    dm = _rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"OK ({len(s_rows)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("parity-check")
    con = duck_connection(sf_dir)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            ok, msg = compare_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.1f}s  {msg}", flush=True)
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
