"""Event-time windowed aggregation over the ``events`` table.

The reference has no event-time windows (SURVEY §2.2) — its only
time-ish op is the per-batch lag metric.  These are the standard
Structured-Streaming window family, written as batch DataFrame plans
(identical graphs run incrementally under readStream; see
streaming/job.py for the watermarked variants):

* tumbling  — ``window(ts, size)``
* sliding   — ``window(ts, size, slide)``
* session   — ``session_window(ts, gap)`` per user

All outputs format timestamps as strings (engine-portable) and aggregate
``value`` as DECIMAL(18,2) (exact, order-independent — double sums are
partitioning-dependent and would not oracle-match).

Scale notes: tumbling/sliding group keys are (window, dims) — map-side
partial aggregation collapses each task to one row per window before the
shuffle.  Sliding with size/slide = 2 duplicates each row twice (Spark
expands windows before aggregating) — the partial agg still bounds the
shuffle by #windows.  Session windows shuffle by user_id then
sort-merge sessions within each key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TS_OUT_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling(events: DataFrame, size: str = "1 hour") -> DataFrame:
    w = F.window(F.col("ts"), size)
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_d"),
        )
        .select(
            F.date_format("w.start", TS_OUT_FMT).alias("window_start"),
            "event_type",
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
        )
    )


def sliding(
    events: DataFrame, size: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    w = F.window(F.col("ts"), size, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_d"),
        )
        .select(
            F.date_format("w.start", TS_OUT_FMT).alias("window_start"),
            F.date_format("w.end", TS_OUT_FMT).alias("window_end"),
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows: start = first event, end = last + gap."""
    w = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy(w.alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_d"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
        )
    )


def multires_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style hierarchical rollup: minute + hour + day grains
    in ONE raw scan.

    A naive "minute → hour → day, union all three" DAG re-scans the raw
    events once per branch (no exchange reuse across union branches —
    measured, not assumed).  Instead: aggregate once at the finest
    (minute) grain, explode each minute row to its three resolution
    buckets (3× a ~10⁴×-reduced intermediate, not 3× raw), and
    re-aggregate by (resolution, bucket).  Decimal sums/counts merge
    losslessly, so the coarser grains are exact."""
    minute = events.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("m_bucket"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_d"),
    )
    expanded = minute.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("minute").alias("resolution"),
                    F.col("m_bucket").alias("bucket"),
                ),
                F.struct(
                    F.lit("hour").alias("resolution"),
                    F.date_trunc("hour", F.col("m_bucket")).alias("bucket"),
                ),
                F.struct(
                    F.lit("day").alias("resolution"),
                    F.date_trunc("day", F.col("m_bucket")).alias("bucket"),
                ),
            )
        ).alias("r"),
        "event_type",
        "n_events",
        "sum_value_d",
    )
    return (
        expanded.groupBy("r.resolution", "r.bucket", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_d").alias("sum_value_d"),
        )
        .select(
            "resolution",
            F.date_format("bucket", TS_OUT_FMT).alias("bucket"),
            "event_type",
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
        )
    )


def user_event_deltas(events: DataFrame) -> DataFrame:
    """lag() analytics: per-user previous event value/type and seconds
    since previous event — the generalized per-key-latest machinery the
    reference's checkpoint (op 8) is a special case of."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("secs_since_prev"),
        F.row_number().over(w).alias("event_seq"),
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization by inactivity gap (gaps-and-islands): a new
    session starts when the pause since the previous event exceeds the
    gap.  One window pass for the gap flags + running session number,
    one aggregation for the per-session rollup — the batch twin of the
    streaming ``session_window`` operator above, with identical gap
    semantics and integer-exact outputs.

    Scale notes (100 TB): both passes shuffle on user_id only; sessions
    never cross users, so pre-bucketing the event log by user_id makes
    the window pass shuffle-free.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
            > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    ).withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("start_s"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("end_s"),
        (
            (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts"))))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("duration_secs"),
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """SCD-2 history build from an event log: collapse each user's
    event-type stream into change rows with validity intervals
    [valid_from, valid_to) — valid_to = next change's timestamp, open
    intervals marked with a sentinel.  The dimension-table maintenance
    shape CDC pipelines feed.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("state"),
            F.lag("event_type").over(w).alias("prev_state"),
        )
        .where(
            F.col("prev_state").isNull()
            | (F.col("state") != F.col("prev_state"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w2), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            F.lit("9999-12-31 00:00:00.000000"),
        ).alias("valid_to"),
    )
