"""Invariants of the generated sf1 fixture (tools/make_sf1.py).

Runs only when the gitignored fixture exists (it is regenerated per
round, not committed); each check failed at least once during
development, so they are pinned:

* schema byte-equality with the source tables (incl. TIMESTAMP(NANOS));
* key uniqueness — the copy stride must be max+1 because the driver's
  keys are 0-based (a plain-max stride collides at every copy boundary);
* referential integrity across all shifted foreign keys;
* cross-copy token disjointness for documents (keeps pair-producing
  queries linear in the inflation factor).
"""

from __future__ import annotations

import os

import pytest

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".fixtures", "sf1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DST), reason="sf1 fixture not generated (tools/make_sf1.py)"
)


def test_schemas_match_source():
    import pyarrow.parquet as pq

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        a = pq.ParquetFile(f"{SRC}/{t}.parquet").schema_arrow
        b = pq.ParquetFile(f"{DST}/{t}.parquet").schema_arrow
        assert a.equals(b), t


def test_keys_unique_and_scaled_10x():
    import duckdb

    con = duckdb.connect()
    for t, k, factor in [("documents", "doc_id", 10), ("embeddings", "vec_id", 10),
                         ("customer", "c_custkey", 10), ("orders", "o_orderkey", 10),
                         ("events", "event_id", 10)]:
        src_n = con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        d, n = con.execute(
            f"SELECT count(DISTINCT {k}), count(*) FROM '{DST}/{t}.parquet'"
        ).fetchone()
        assert d == n == src_n * factor, (t, d, n, src_n)


def test_referential_integrity():
    import duckdb

    con = duckdb.connect()
    for l, lk, r, rk in [("lineitem", "l_orderkey", "orders", "o_orderkey"),
                         ("lineitem", "l_partkey", "part", "p_partkey"),
                         ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
                         ("orders", "o_custkey", "customer", "c_custkey")]:
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{l}.parquet' a "
            f"LEFT JOIN '{DST}/{r}.parquet' b ON a.{lk} = b.{rk} "
            f"WHERE b.{rk} IS NULL"
        ).fetchone()[0]
        assert n == 0, (l, lk)


def test_document_copies_share_no_tokens():
    import duckdb

    con = duckdb.connect()
    src_docs = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    shared = con.execute(f"""
        WITH a AS (SELECT unnest(string_split(text, ' ')) tok
                   FROM '{DST}/documents.parquet' WHERE doc_id = 0),
             b AS (SELECT unnest(string_split(text, ' ')) tok
                   FROM '{DST}/documents.parquet' WHERE doc_id = {src_docs})
        SELECT count(*) FROM a JOIN b USING (tok)
    """).fetchone()[0]
    assert shared == 0
