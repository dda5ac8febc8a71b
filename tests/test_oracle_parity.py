"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from parity import compare_query, duck_connection  # noqa: E402

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


# files_layout_lineitem's oracle reads file boundaries via DuckDB
# parquet_file_metadata/read_blob, which take LITERAL paths — the oracle
# pins the driver's correctness SF (sf0.01), so parity for it must run
# at sf0.01 on both sides regardless of the suite's smoke SF.
_PINNED_SF = {"files_layout_lineitem": "/root/testdata/sf0.01"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    if name in _PINNED_SF:
        sf_dir = _PINNED_SF[name]
        duck = duck_connection(sf_dir)
        try:
            ok, msg = compare_query(spark, duck, name, sf_dir)
        finally:
            duck.close()
    else:
        ok, msg = compare_query(spark, duck, name, sf_dir)
    assert ok, msg
