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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    ok, msg = compare_query(spark, duck, name, sf_dir)
    assert ok, msg
