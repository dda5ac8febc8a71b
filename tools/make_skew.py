"""Adversarial skew fixture (round-7 verdict ask #5): same schemas as
the driver's sf0.01 tables, distributions engineered to stress every
cap the 100-TB story leans on.

Built deterministically (row-index arithmetic, no RNG) from
/root/testdata/sf0.01:

* ``documents``
  - doc_id remap: the first HALF of docs get ids ≡ 0 (mod 4), so ONE
    host (cdn0.example.com, derived from doc_id % 4 by the in-query
    URL fixture) owns 50% of all URLs — million-row canonical-key
    pressure on url_dedup_groups / host profile rollups;
  - BOILERPLATE: ~72% of docs (non-mega-dup, 4 of every 5) get the same sentence appended — one
    shingle/char-gram family lands in 80% of the corpus, the exact
    hot-key class the ngram-Jaccard DF cap and the chargram hot-gram
    handling must survive;
  - MEGA-DUP: 10% of docs share one identical text — a single exact-dup
    cluster (and one giant MinHash/SimHash bucket) far above anything
    in the benign fixtures;
  - n_chars recomputed so the metadata stays consistent with text.
* ``events``
  - 90% of rows collapse onto ONE event_type ('click') — stream/groupBy
    key skew (the kr_* replication family sees one stream carrying 90%
    of records);
  - 50% of rows collapse onto ONE user_id — a heavy-hitter entity for
    per-user rollups and salted aggregation paths.
* ``customer`` (round 8, for the linkage family)
  - 50% of customers collapse onto ONE linkage block: nation 7 with
    acctbal inside a single $10 band, so BOTH the coarse ($1000) and
    fine ($10) blocking passes see one block holding half the records
    — far past the 64-per-side cap; the multi-pass capped blocking
    must stay bounded AND hash-correct when its primary block
    collapses.
* ``orders`` (round 8, for the CMS join-size family)
  - 90% of orders collapse onto ONE o_custkey — a hot join key whose
    single CMS cell dominates the inner-product estimate; the
    one-sided bound must survive extreme key concentration.
* every other table is copied verbatim (schema-preserving, so the
  parity harness can register all views).

Parity on this fixture compares Spark vs DuckDB ON THE SAME skewed
parquet, so hash-green here means the operators are CORRECT under
skew; the companion test (tests/test_skew_caps.py) asserts the capped
plans stay explosion-free (row-count ceilings).

Usage: python tools/make_skew.py [src_dir] [out_dir]
       (defaults: /root/testdata/sf0.01 -> <repo>/.fixtures/skew)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

BOILERPLATE = (
    " subscribe to our newsletter for updates terms of service apply "
    "all rights reserved contact support for help"
)

HOT_TYPE = "click"


def skew_documents(src: str, dst: str) -> None:
    t = pq.read_table(src)
    n = t.num_rows
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()

    # doc_id remap: first half ≡ 0 (mod 4); second half cycles 1/2/3
    # (mod 4).  Ids stay unique and dense-ish; the %2/%3/%5/%6/%7 legs
    # of the URL fixture keep varying so canonical groups stay rich.
    half = n // 2
    new_ids = []
    for i in range(n):
        if i < half:
            new_ids.append(4 * i)  # ≡ 0 (mod 4) → host cdn0
        else:
            j = i - half
            new_ids.append(4 * j + 1 + (j % 3))  # ≡ 1/2/3 (mod 4)
    assert len(set(new_ids)) == n

    mega = texts[0] if texts and texts[0] else "dup seed text"
    new_texts = []
    for i in range(n):
        tx = texts[i]
        if i % 10 == 0:
            tx = mega  # 10%: one giant identical-text cluster
        elif tx is not None and i % 5 != 4:
            tx = tx + BOILERPLATE  # ~72%: shared hot shingles/grams
        new_texts.append(tx)

    out = pa.table(
        {
            "doc_id": pa.array(new_ids, pa.int64()),
            "text": pa.array(new_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(
                [None if tx is None else len(tx) for tx in new_texts],
                pa.int64(),
            ),
        }
    )
    pq.write_table(out, dst)


def skew_events(src: str, dst: str) -> None:
    t = pq.read_table(src)
    n = t.num_rows
    types = t.column("event_type").to_pylist()
    users = t.column("user_id").to_pylist()
    hot_user = users[0]
    new_types = [HOT_TYPE if i % 10 != 9 else types[i] for i in range(n)]
    new_users = [hot_user if i % 2 == 0 else users[i] for i in range(n)]
    cols = {}
    for name in t.schema.names:
        if name == "event_type":
            cols[name] = pa.array(new_types, pa.string())
        elif name == "user_id":
            cols[name] = pa.array(new_users, t.schema.field("user_id").type)
        else:
            cols[name] = t.column(name)
    pq.write_table(
        pa.table(cols, schema=t.schema), dst
    )


HOT_NATION = 7


def skew_customer(src: str, dst: str) -> None:
    """50% of customers into ONE linkage block: nation HOT_NATION with
    acctbal in [5000.00, 5000.09] — a single $10 band, so the fine
    blocking pass is just as hot as the coarse one and the 64-per-side
    cap must engage on both.  Keys stay untouched (c_custkey unique)."""
    t = pq.read_table(src)
    n = t.num_rows
    nat = t.column("c_nationkey").to_pylist()
    bal = t.column("c_acctbal").to_pylist()
    new_nat, new_bal = [], []
    for i in range(n):
        if i % 2 == 0:
            new_nat.append(HOT_NATION)
            new_bal.append(5000.0 + (i % 10) / 100.0)
        else:
            new_nat.append(nat[i])
            new_bal.append(bal[i])
    cols = {}
    for name in t.schema.names:
        if name == "c_nationkey":
            cols[name] = pa.array(new_nat, t.schema.field(name).type)
        elif name == "c_acctbal":
            cols[name] = pa.array(new_bal, t.schema.field(name).type)
        else:
            cols[name] = t.column(name)
    pq.write_table(pa.table(cols, schema=t.schema), dst)


def skew_orders(src: str, dst: str) -> None:
    """90% of orders onto ONE o_custkey: the join-size CMS grids get a
    single dominant cell and the exact join size is quadratic in the
    hot key — the estimate's one-sided guarantee is exactly what this
    stresses."""
    t = pq.read_table(src)
    n = t.num_rows
    cust = t.column("o_custkey").to_pylist()
    hot = cust[0]
    new_cust = [hot if i % 10 != 9 else cust[i] for i in range(n)]
    cols = {}
    for name in t.schema.names:
        if name == "o_custkey":
            cols[name] = pa.array(new_cust, t.schema.field(name).type)
        else:
            cols[name] = t.column(name)
    pq.write_table(pa.table(cols, schema=t.schema), dst)


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(_REPO, ".fixtures", "skew")
    )
    os.makedirs(out_dir, exist_ok=True)
    for tbl in TABLES:
        src = os.path.join(src_dir, tbl + ".parquet")
        dst = os.path.join(out_dir, tbl + ".parquet")
        if tbl == "documents":
            skew_documents(src, dst)
        elif tbl == "events":
            skew_events(src, dst)
        elif tbl == "customer":
            skew_customer(src, dst)
        elif tbl == "orders":
            skew_orders(src, dst)
        else:
            shutil.copyfile(src, dst)
        print(f"{tbl}: {dst}")
    print(f"skew fixture -> {out_dir}")


if __name__ == "__main__":
    main()
