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

import __spark_entry__ as _entry
from aws_kinesis_data_streams_replicator_spark.sources.tables import TABLES
from aws_kinesis_data_streams_replicator_spark.session import get_spark

# Exercise the exact callables the driver runs (the __spark_entry__ wrap
# applies session conf + ships the package zip to executors), not the raw
# registry — a foreign-cwd ModuleNotFoundError only reproduces this way.
QUERIES = _entry.queries()
ORACLE_SQL = _entry.oracle_sql()


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


def _pandas_kind(dtype) -> str:
    """Collapse a pandas dtype to the equivalence class the driver's
    dtype-sensitive value hash distinguishes (round-1 evidence: int32 vs
    int64 passes, int64 vs float64 FAILS — DuckDB HUGEINT→float64 while
    Spark's null-free integer sum stays int64)."""
    import pandas.api.types as pt

    if pt.is_bool_dtype(dtype):
        return "bool"
    if pt.is_integer_dtype(dtype):
        return "int"
    if pt.is_float_dtype(dtype):
        return "float"
    if pt.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


_SPARK_INT_TYPES = ("byte", "short", "integer", "long")


def _spark_pandas_kinds(sdf, rows) -> dict[str, str]:
    """Predict the pandas dtype kind of each column of ``sdf.toPandas()``
    WITHOUT a second job: from the Spark schema plus null presence in the
    already-collected rows (pandas promotes null-bearing ints/bools)."""
    kinds = {}
    for i, f in enumerate(sdf.schema.fields):
        t = f.dataType.typeName()
        has_null = any(r[i] is None for r in rows)
        if t in _SPARK_INT_TYPES:
            kinds[f.name] = "float" if has_null else "int"
        elif t in ("float", "double"):
            kinds[f.name] = "float"
        elif t == "boolean":
            kinds[f.name] = "object" if has_null else "bool"
        elif t == "timestamp":
            kinds[f.name] = "datetime"
        else:
            # decimal → object(Decimal), string/array/struct/binary/date → object
            kinds[f.name] = "object"
    return kinds


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
    # dtype-kind gate: the driver hashes pandas values dtype-sensitively,
    # so both engines must land on the same pandas dtype KIND per column.
    d_kinds = {
        c: _pandas_kind(dt)
        for c, dt in con.execute(ORACLE_SQL[name]).df().dtypes.items()
    }
    s_kinds = _spark_pandas_kinds(sdf, s_rows)
    kind_diffs = {
        c: (s_kinds[c], d_kinds[c]) for c in s_kinds if s_kinds[c] != d_kinds.get(c, "?")
    }
    if kind_diffs:
        return False, f"dtype-kind mismatch (spark, duck): {kind_diffs}"
    sm = _rows_to_multiset(s_cols, s_rows)
    dm = _rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"OK ({len(s_rows)} rows)"


# Queries whose oracle bakes in a literal path (DuckDB file-metadata
# functions can't read from a view): parity always runs them at the
# driver's correctness SF, whatever SF the rest of the run uses.
PINNED_SF = {"files_layout_lineitem": "/root/testdata/sf0.01"}


def write_artifact(json_path: str, sf_dir: str, results: dict, merge: bool) -> dict:
    """Write a parity artifact whose ``n_pass``/``n_total`` are ALWAYS
    derived from the entries actually present in the file.

    ``merge=True`` folds ``results`` into an existing artifact at
    ``json_path`` (multi-session sf1 gates are built incrementally);
    the counts are recomputed from the MERGED ``queries`` dict, so a
    partial append can never ship stale summary counts again
    (round-6 post-mortem: PARITY_SF1_r06.json said 37/37 but held 49
    entries).  A mismatched ``sf_dir`` on merge is an error."""
    import json

    merged = dict(results)
    if merge and os.path.exists(json_path):
        with open(json_path) as fh:
            prev = json.load(fh)
        if prev.get("sf_dir") != sf_dir:
            raise SystemExit(
                f"--merge sf_dir mismatch: artifact={prev.get('sf_dir')} run={sf_dir}"
            )
        merged = {**prev.get("queries", {}), **results}
    payload = {
        "sf_dir": sf_dir,
        "n_pass": sum(1 for v in merged.values() if v["ok"]),
        "n_total": len(merged),
        "queries": merged,
    }
    assert payload["n_total"] == len(payload["queries"])
    with open(json_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    return payload


def main():
    argv = list(sys.argv[1:])
    json_path = None
    merge = False
    if "--merge" in argv:
        merge = True
        argv.remove("--merge")
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    names = argv[1:] or list(QUERIES)
    spark = get_spark("parity-check")
    con = duck_connection(sf_dir)
    failed = []
    results = {}
    for name in names:
        t0 = time.time()
        q_sf = PINNED_SF.get(name, sf_dir)
        try:
            if q_sf != sf_dir:
                pinned_con = duck_connection(q_sf)
                try:
                    ok, msg = compare_query(spark, pinned_con, name, q_sf)
                finally:
                    pinned_con.close()
            else:
                ok, msg = compare_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.1f}s  {msg}", flush=True)
        results[name] = {"ok": ok, "msg": msg, "sec": round(dt, 1)}
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if json_path:
        payload = write_artifact(json_path, sf_dir, results, merge)
        print(f"artifact: {payload['n_pass']}/{payload['n_total']} in {json_path}")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
