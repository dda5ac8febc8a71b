"""Invariants of the files_bloom_pruning advisor.

The value oracle pins exact numbers; these tests pin the CLAIMS the
advisor exists to make, on the DuckDB twin (no JVM round-trip):

* no false negatives, ever, in any layout (the Bloom guarantee);
* absent probes admit (almost) nothing — the needle-lookup win;
* a key-clustered layout admits strictly fewer file-probes for
  present keys than ingestion order (Blooms need clustering to prune
  PRESENT lookups).
"""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def rows():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    out = con.execute(mod.oracle_sql()["files_bloom_pruning"]).df()
    con.close()
    return {
        (r.layout, r.probe_class): r for r in out.itertuples(index=False)
    }


def test_no_false_negatives_everywhere(rows):
    assert all(r.no_false_negatives for r in rows.values())
    # and the bloom admits a superset of the actual files
    assert all(
        r.admitted_file_probes >= r.actual_file_probes
        for r in rows.values()
    )


def test_absent_probes_skip_nearly_everything(rows):
    for layout in ("ingestion", "key_range"):
        r = rows[(layout, "absent")]
        assert r.actual_file_probes == 0
        assert r.admit_ratio_bp < 2_000  # <20% of files touched


def test_present_pruning_requires_clustering(rows):
    ing = rows[("ingestion", "present")]
    kr = rows[("key_range", "present")]
    # the clustered layout concentrates each key into ~1 file
    assert kr.actual_file_probes <= kr.n_probe_keys * 2
    assert kr.admitted_file_probes < ing.admitted_file_probes
    assert kr.admit_ratio_bp < ing.admit_ratio_bp
