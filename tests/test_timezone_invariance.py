"""Session-timezone invariance: every checked output must be identical
whatever ``spark.sql.session.timeZone`` the (driver-owned) session uses.

Why this matters: the loader normalizes TIMESTAMP_NTZ parquet columns
via a cast that APPLIES the session timezone, and formatted outputs
re-apply it — the design contract is that the two cancel, so wall-clock
strings, integer lags, and bucketed counts are TZ-invariant.  A
regression here only shows up when the driver's session isn't UTC."""

from __future__ import annotations

import pytest

from aws_kinesis_data_streams_replicator_spark.plans.queries import QUERIES

# timestamp-heavy queries spanning the distinct shapes: formatted
# strings (kr_batch_metrics), unix-micro bucketing (evt_range_count_5m),
# calendar part extraction (fn_date_parts), windowed counts
# (evt_tumbling_hourly), interval strings (cdc_scd2_intervals)
_QUERIES = [
    "kr_batch_metrics",
    "evt_range_count_5m",
    "fn_date_parts",
    "evt_tumbling_hourly",
    "cdc_scd2_intervals",
]


@pytest.mark.parametrize("name", _QUERIES)
def test_output_identical_under_foreign_session_tz(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    utc_rows = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_rows = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert ny_rows == utc_rows
