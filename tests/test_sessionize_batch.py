"""Gaps-and-islands sessionization semantics on planted timelines."""

from __future__ import annotations

from aws_kinesis_data_streams_replicator_spark.operators.windows import (
    sessionize_batch,
)


def test_session_splits_on_gap(spark):
    # user 1: events at 0m, 10m, 50m (gap 40m > 30m → two sessions)
    # user 2: single event → one 1-event session
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1L, 100L, TIMESTAMP '2024-01-01 00:00:00'),
          (1L, 101L, TIMESTAMP '2024-01-01 00:10:00'),
          (1L, 102L, TIMESTAMP '2024-01-01 00:50:00'),
          (2L, 200L, TIMESTAMP '2024-01-01 09:00:00')
        AS t(user_id, event_id, ts)
        """
    )
    out = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_secs)
        for r in sessionize_batch(df, gap_minutes=30).collect()
    }
    assert out == {
        (1, 0): (2, 600),  # 00:00–00:10
        (1, 1): (1, 0),  # 00:50 alone
        (2, 0): (1, 0),
    }


def test_boundary_gap_exactly_at_limit_stays_open(spark):
    # a gap of exactly 30m is NOT > 30m → same session
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1L, 1L, TIMESTAMP '2024-01-01 00:00:00'),
          (1L, 2L, TIMESTAMP '2024-01-01 00:30:00')
        AS t(user_id, event_id, ts)
        """
    )
    rows = sessionize_batch(df, gap_minutes=30).collect()
    assert len(rows) == 1 and rows[0].n_events == 2
