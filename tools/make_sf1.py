"""Deterministic sf1 fixture generator: inflate the driver's sf0.1
tables by FACTOR (default 10) key-shifted copies.

The driver's generator is not in-repo, so the next rung on the scale
ladder is built by replication that preserves every schema (including
events' TIMESTAMP(NANOS)) and all referential integrity: copy ``i``
shifts each entity key by ``i * max_key(source)``, with foreign keys
shifted by their referenced table's offset, so each copy is a disjoint,
internally-consistent shard of the same world.  Fixed-size dimensions
(region, nation) are shared across copies, exactly like TPC-H.

Two deliberate choices keep pair-producing queries LINEAR in the
factor rather than quadratic:

* ``documents.text`` is token-mutated per copy (every token gets a
  per-copy suffix), so cross-copy docs share no shingles and near-dup
  pair counts scale with the factor, matching how independent corpus
  shards behave;
* ``embeddings`` are copied verbatim: cross-copy exact clones are tied
  by dot product and every engine breaks the tie on neighbor_id, so
  ANN outputs stay deterministic while exact-dup/clone handling gets a
  real workout.

Parity at sf1 compares Spark vs DuckDB ON THE SAME inflated data, so
the fixture needs no agreement with the driver generator's internals —
only with its schemas.

Usage: python tools/make_sf1.py [src_dir] [out_dir] [factor]
       (defaults: /root/testdata/sf0.1 -> <repo>/.fixtures/sf1, x10)
"""

from __future__ import annotations

import os
import re
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# table -> {column: offset source table+key}; offsets are the max key of
# the SOURCE table so shifted copies never collide
KEY_SHIFTS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
SHARED_DIMS = ("region", "nation")


def _mutate_texts(texts: list[str | None], copy_idx: int) -> list[str | None]:
    """Suffix every token with a per-copy tag: copy i and copy j share
    zero tokens (hence zero shingles), so similarity queries see the
    copies as unrelated corpora."""
    tag = f"q{copy_idx}z"
    return [
        None if t is None else re.sub(r"(\S+)", rf"\1{tag}", t)
        for t in texts
    ]


def inflate_table(
    src_dir: str, name: str, factor: int, maxes: dict[tuple[str, str], int]
) -> pa.Table:
    t = pq.read_table(os.path.join(src_dir, f"{name}.parquet"))
    shifts = KEY_SHIFTS[name]
    copies = [t]
    for i in range(1, factor):
        cols = []
        for col_name in t.column_names:
            col = t.column(col_name)
            if col_name in shifts:
                # keys are 0-based: a stride of max+1 keeps copies disjoint
                off = i * (maxes[shifts[col_name]] + 1)
                col = pc.add(col, pa.scalar(off, type=col.type))
            elif name == "documents" and col_name == "text":
                col = pa.chunked_array(
                    [pa.array(_mutate_texts(col.to_pylist(), i))]
                )
            cols.append(col)
        copies.append(pa.table(dict(zip(t.column_names, cols)), schema=None))
    out = pa.concat_tables(copies, promote_options="none")
    if name == "documents":
        # keep n_chars consistent with the mutated text
        n_chars = pc.cast(pc.utf8_length(out.column("text")),
                          out.column("n_chars").type)
        out = out.set_column(
            out.column_names.index("n_chars"),
            out.schema.field("n_chars"),
            n_chars,
        )
    return out.cast(t.schema)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(_REPO, ".fixtures", "sf1")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    maxes: dict[tuple[str, str], int] = {}
    for _, shifts in KEY_SHIFTS.items():
        for ref in shifts.values():
            if ref not in maxes:
                ref_t = pq.read_table(
                    os.path.join(src, f"{ref[0]}.parquet"), columns=[ref[1]]
                )
                maxes[ref] = pc.max(ref_t.column(ref[1])).as_py()

    for name in SHARED_DIMS:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (shared dim)")
    for name in KEY_SHIFTS:
        out = inflate_table(src, name, factor, maxes)
        # row groups sized so Spark splits the single file across tasks
        pq.write_table(
            out,
            os.path.join(dst, f"{name}.parquet"),
            row_group_size=200_000,
        )
        print(f"{name}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
