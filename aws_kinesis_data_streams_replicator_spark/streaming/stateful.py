"""Custom stateful streaming operator via applyInPandasWithState.

The reference's checkpoint (op 8) is a degenerate stateful operator
(per-key max).  This is the general form: arbitrary per-key state
maintained across micro-batches — the escape hatch for semantics the
built-in streaming aggregations can't express (counters with custom
merge, per-key ML state, cross-batch sequence detection).

Scale notes: state is partitioned by the group key and checkpointed via
the WAL (RocksDB state store on a real cluster:
``spark.sql.streaming.stateStore.providerClass``).  Always pair with a
timeout (or watermark-scoped keys) in production so state can't grow
unboundedly; NoTimeout here because stream names are finite.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = (
    "streamName string, total_records long, last_commit_ts string, n_batches long"
)
STATE_SCHEMA = "total_records long, last_commit_ts string, n_batches long"


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, last_ts, n_batches = (
        state.get if state.exists else (0, None, 0)
    )
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        ts = pdf["commitTimestamp"].dropna()
        if len(ts):
            m = ts.max()  # ISO-8601 strings: lexicographic == chronological
            last_ts = m if last_ts is None else max(last_ts, m)
    total += batch_rows
    n_batches += 1
    state.update((total, last_ts, n_batches))
    yield pd.DataFrame(
        {
            "streamName": [key[0]],
            "total_records": [total],
            "last_commit_ts": [last_ts],
            "n_batches": [n_batches],
        }
    )


def running_stream_totals(decoded_stream: DataFrame) -> DataFrame:
    """Per-stream running totals across ALL micro-batches seen so far —
    state the per-batch reference can't express at all (its only memory
    is the external checkpoint row)."""
    return decoded_stream.select("streamName", "commitTimestamp").groupBy(
        "streamName"
    ).applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of ``_update_totals`` — the
    Spark-4 arbitrary-state API (typed state handles, timers, TTL)
    replacing applyInPandasWithState's single state tuple.  Kept
    behavior-identical so the two APIs are directly comparable; the
    pytest contract asserts equal final output."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        total, last_ts, n_batches = (
            self._state.get() if self._state.exists() else (0, None, 0)
        )
        for pdf in rows:
            total += len(pdf)
            ts = pdf["commitTimestamp"].dropna()
            if len(ts):
                m = ts.max()  # ISO-8601: lexicographic == chronological
                last_ts = m if last_ts is None else max(last_ts, m)
        n_batches += 1
        self._state.update((total, last_ts, n_batches))
        yield pd.DataFrame(
            {
                "streamName": [key[0]],
                "total_records": [total],
                "last_commit_ts": [last_ts],
                "n_batches": [n_batches],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


class ExpiringTotalsProcessor(RunningTotalsProcessor):
    """TTL variant: the totals ValueState expires ``ttl_ms`` after its
    last update (state-store-enforced, per Spark's TTL config — no timer
    bookkeeping in user code).  A stream idle longer than the TTL
    restarts its totals from zero: bounded state for unbounded key
    cardinality, the knob the 100 TB deployment sets so dead streams
    don't pin RocksDB memory forever."""

    def __init__(self, ttl_ms: int = 60 * 60 * 1000) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "totals", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )


def running_stream_totals_ttl(
    decoded_stream: DataFrame, ttl_ms: int = 60 * 60 * 1000
) -> DataFrame:
    """``running_stream_totals_tws`` with a state TTL — requires
    ``timeMode="ProcessingTime"`` (TTL is wall-clock-based).  Same
    protobuf caveat as the non-TTL twin."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    return (
        decoded_stream.select("streamName", "commitTimestamp")
        .groupBy("streamName")
        .transformWithStateInPandas(
            ExpiringTotalsProcessor(ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )


def running_stream_totals_tws(decoded_stream: DataFrame) -> DataFrame:
    """``running_stream_totals`` re-expressed on ``transformWithState``
    (Spark 4's arbitrary-stateful-processing API): per-key ValueState,
    update output mode, processing-time semantics.

    The operator's schema-validation step runs the processor in a
    dedicated DRIVER-side Python worker with a fresh sys.path — the same
    pickle transport as the Python data-source planner (see
    sources/generator.py), so this module must pickle BY VALUE.

    Environment note: executing the query (not building it) additionally
    requires ``google.protobuf`` — the transformWithState state server
    speaks proto between JVM and Python.  This container ships no
    protobuf and installs are forbidden, so the end-to-end test is
    import-gated (tests/test_streaming_round2.py), exactly like the
    multimodal decode stub."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    return (
        decoded_stream.select("streamName", "commitTimestamp")
        .groupBy("streamName")
        .transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id long, n_events long, first_us long, last_us long, closed boolean"
)
SESSION_STATE_SCHEMA = "n_events long, first_us long, last_us long"


def _session_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_ms = 10 * 60 * 1000
    if state.hasTimedOut:
        n, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_us": [first_us],
                "last_us": [last_us],
                "closed": [True],
            }
        )
        return
    n, first_us, last_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        us = pdf["ts"].astype("int64") // 1000  # ns → µs
        n += len(pdf)
        # plain ints: the state tuple is JSON-serialized, np.int64 isn't
        lo, hi = int(us.min()), int(us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, first_us, last_us))
    # close when the EVENT-TIME watermark passes last event + gap
    state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "first_us": [first_us],
            "last_us": [last_us],
            "closed": [False],
        }
    )


def expiring_user_sessions(
    events_stream: DataFrame, watermark_delay: str = "1 minute"
) -> DataFrame:
    """Custom sessionization WITH state expiry: per-user counters that
    emit a final ``closed=true`` row and DELETE their state when the
    event-time watermark passes (last event + 10-minute gap) — the
    EventTimeTimeout pattern that keeps 100 TB keyed state bounded
    (the NoTimeout totals operator above is the unbounded-keys
    counterexample; finite stream names make that safe, user ids do
    not)."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


CUSUM_OUT_SCHEMA = (
    "event_type string, n_seen long, mean_cents long, cusum_cents long, "
    "alarm boolean"
)
# v2: cents are floor(value*100) — v1 state accumulated toward-zero
# truncated cents, so restoring a v1 checkpoint into the floor-based
# update would silently mix conventions on negative-value streams.
# The schema change (added cents_conv field) makes the state store's
# schema-compatibility gate REJECT a v1 checkpoint at restore instead;
# v1 checkpoints must be discarded, not migrated.
CUSUM_STATE_SCHEMA = "n long, sum_c long, cusum_c long, cents_conv int"
_CENTS_CONV = 2


def _cusum_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    slack_c = 500  # ignore drifts smaller than 5.00 in value units
    threshold_c = 20000  # alarm when accumulated drift passes 200.00
    n, sum_c, cusum_c, conv = (
        state.get if state.exists else (0, 0, 0, _CENTS_CONV)
    )
    if conv != _CENTS_CONV:
        raise ValueError(
            f"CUSUM state written under cents convention v{conv}; "
            f"this build computes v{_CENTS_CONV} (floor) — discard the "
            "checkpoint and re-run from the source"
        )
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        # np.floor before the cast: a bare int64 cast truncates toward
        # zero, which diverges from the repo-wide floor(value*100) cents
        # convention on negative values (batch drift monitor uses floor)
        for cents in (
            np.floor(pdf["value"] * 100).astype("int64").map(int)
        ):
            # deviation vs the PRE-update running mean: online CUSUM
            if n > 0:
                dev = cents - sum_c // n - slack_c
                cusum_c = max(0, cusum_c + dev)
            n += 1
            sum_c += cents
    state.update((int(n), int(sum_c), int(cusum_c), _CENTS_CONV))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n],
            "mean_cents": [sum_c // n if n else 0],
            "cusum_cents": [cusum_c],
            "alarm": [cusum_c >= threshold_c],
        }
    )


def streaming_cusum_alerts(events_stream: DataFrame) -> DataFrame:
    """Online CUSUM change detection per event type: bounded keyed state
    (n, Σcents, CUSUM) updated row-at-a-time in event order, one status
    row per (type, batch) with the alarm flag — the streaming twin of
    the batch dq_distribution_drift monitor, catching a sustained
    upward shift in value as it happens instead of at the next offline
    comparison.  Integer arithmetic end-to-end so replayed batches
    recompute identical state; keys are event types (finite), so
    NoTimeout state is bounded by construction."""
    return (
        events_stream.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _cusum_update,
            outputStructType=CUSUM_OUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


QSKETCH_OUT_SCHEMA = (
    "event_type string, n_seen long, est_p50_cents long, "
    "rank_err_bound long, summary_size long"
)
QSKETCH_STATE_SCHEMA = (
    "vals array<long>, ws array<long>, n long, err long"
)
_QSKETCH_CAP = 32


def _qsketch_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    C = _QSKETCH_CAP
    if state.exists:
        vals, ws, n, err = state.get
        pts = dict(zip(vals, ws))
    else:
        pts, n, err = {}, 0, 0
    batch = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        cents = np.floor(pdf["value"] * 100).astype("int64")
        batch += len(cents)
        for v, w in cents.value_counts().items():
            pts[int(v)] = pts.get(int(v), 0) + int(w)
    n += batch
    # shared equi-depth recompression + median (one compaction moves any
    # rank estimate by at most ceil(W/C) + 1 — the same rule and budget
    # _median_drift_update uses, kept in ONE place so the compaction
    # cannot drift between the two stateful operators)
    srt, err_inc, est = _eqd_merge_and_median(pts, C)
    err += err_inc
    state.update((
        [v for v, _ in srt],
        [w for _, w in srt],
        int(n),
        int(err),
    ))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n],
            "est_p50_cents": [est],
            "rank_err_bound": [err],
            "summary_size": [len(srt)],
        }
    )


def streaming_quantile_sketch(events_stream: DataFrame) -> DataFrame:
    """Running per-type median estimate with BOUNDED state: the keyed
    state is the same ≤32-point equi-depth (value, weight) summary the
    batch ``agg_quantile_sketch_merge`` query merges, maintained across
    micro-batches — each batch's exact counts merge into the summary,
    which recompresses only when it exceeds capacity, accumulating an
    explicit rank-error budget (``rank_err_bound``) as it does.  The
    derandomized-KLL tradeoff: reproducible state for a per-compaction
    additive bound instead of the randomized worst-case guarantee.

    Bound caveat (long-running streams): each compaction adds
    ceil(W/C) + 1 with W = TOTAL weight so far, so over an unbounded
    stream the accumulated ``rank_err_bound`` grows roughly linearly in
    n per compaction epoch and eventually exceeds n/2 — still sound
    (never understates the error) but vacuous for consumers.  For a
    non-vacuous guarantee on unbounded streams use
    ``streaming_quantile_kll`` (level-based compaction, logarithmic
    budget growth); this single-level summary remains the right shape
    for bounded replay windows and for merging with the batch
    ``agg_quantile_sketch_merge`` legs, which share the identical
    compaction rule.

    Scale notes: state is O(capacity) longs per event type regardless
    of stream length — the mergeable-summary property is exactly what
    makes a quantile maintainable in a state store at all; emitting the
    bound alongside the estimate keeps the consumer honest about
    drift.  NoTimeout because event types are finite; add a TTL for
    unbounded keys.
    """
    return events_stream.select("event_type", "value").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _qsketch_update,
        outputStructType=QSKETCH_OUT_SCHEMA,
        stateStructType=QSKETCH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MDRIFT_OUT_SCHEMA = (
    "event_type string, n_seen long, batch_median_cents long, "
    "run_median_cents long, shift_cents long, n_shifted_batches long, "
    "alarm boolean"
)
MDRIFT_STATE_SCHEMA = (
    "vals array<long>, ws array<long>, n long, err long, shifted long"
)


def _eqd_merge_and_median(pts: dict, C: int):
    """Shared equi-depth helper: (sorted points, added rank error,
    median estimate) after capacity-bounded recompression — the exact
    compaction rule of ``_qsketch_update``, factored for reuse."""
    srt = sorted(pts.items())
    W = sum(w for _, w in srt)
    err_inc = 0
    if len(srt) > C:
        kept: list[tuple[int, int]] = []
        cum = prev_cum = 0
        k = 1
        for v, w in srt:
            cum += w
            target = -(-k * W // C)  # ceil
            if cum >= target:
                kept.append((v, cum - prev_cum))
                prev_cum = cum
                while k <= C and cum >= -(-k * W // C):
                    k += 1
        err_inc = -(-W // C) + 1
        srt = kept
    est = None
    half = -(-50 * W // 100)
    cum = 0
    for v, w in srt:
        cum += w
        if est is None and cum >= half:
            est = v
    return srt, err_inc, est


def _median_drift_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    C = _QSKETCH_CAP
    shift_threshold_c = 5000  # median moved by > 50.00 value units
    consecutive_needed = 2  # sustained, not a one-batch blip
    if state.exists:
        vals, ws, n, err, shifted = state.get
        pts = dict(zip(vals, ws))
    else:
        pts, n, err, shifted = {}, 0, 0, 0
    batch_cents: list[int] = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        batch_cents.extend(
            np.floor(pdf["value"] * 100).astype("int64").tolist()
        )
    batch_cents.sort()
    batch_med = (
        batch_cents[(len(batch_cents) - 1) // 2] if batch_cents else None
    )
    # run median BEFORE merging this batch: the reference the new batch
    # is judged against (first batch seeds the state and cannot alarm)
    _, _, run_med = _eqd_merge_and_median(pts, C)
    shift = (
        abs(batch_med - run_med)
        if (batch_med is not None and run_med is not None)
        else 0
    )
    if run_med is not None and shift > shift_threshold_c:
        shifted += 1
    else:
        shifted = 0
    alarm = shifted >= consecutive_needed
    for v in batch_cents:
        pts[v] = pts.get(v, 0) + 1
    n += len(batch_cents)
    srt, err_inc, new_run = _eqd_merge_and_median(pts, C)
    err += err_inc
    state.update((
        [v for v, _ in srt],
        [w for _, w in srt],
        int(n),
        int(err),
        int(shifted),
    ))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n],
            "batch_median_cents": [batch_med],
            "run_median_cents": [new_run],
            "shift_cents": [shift],
            "n_shifted_batches": [shifted],
            "alarm": [alarm],
        }
    )


def streaming_median_drift(events_stream: DataFrame) -> DataFrame:
    """Robust drift detection on the RUNNING MEDIAN: each micro-batch's
    median is compared against the pre-merge equi-depth summary median;
    a sustained shift (2 consecutive batches beyond 50.00 units) alarms
    — the robust companion to ``streaming_cusum_alerts``, which keys on
    the mean and therefore fires on a handful of extreme outliers that
    leave the median untouched.  Composition of the two stateful
    summaries this module already maintains: the state is the bounded
    quantile summary plus a shift counter.

    Scale notes: same O(capacity) keyed state as
    ``streaming_quantile_sketch``; the batch median is exact within the
    micro-batch (bounded by trigger size), the reference median is the
    summary estimate whose rank-error budget the sketch tracks."""
    return events_stream.select("event_type", "value").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _median_drift_update,
        outputStructType=MDRIFT_OUT_SCHEMA,
        stateStructType=MDRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KLL_OUT_SCHEMA = (
    "event_type string, n_seen long, est_p50_cents long, "
    "rank_err_bound long, summary_size long, n_levels long"
)
KLL_STATE_SCHEMA = (
    "vals array<long>, lvls array<int>, n long, err long, "
    "parities array<int>"
)
_KLL_LEVEL_CAP = 64


def _kll_compact(levels: list[list[int]], parities: list[int], C: int):
    """Deterministic level compaction, in place: any level over
    capacity is sorted and every other item promoted to the next level
    (weight doubles); which offset survives alternates per level via a
    persisted parity bit — the standard derandomization, so two
    consecutive compactions of a level cancel to first order instead
    of drifting one-sided.  Returns the SOUND rank-error increment:
    one compaction of level h (item weight 2^h) moves any rank
    estimate by at most 2^h — keep the odd positions of the sorted
    level and an estimate can only round a level-h rank contribution
    UP by one item; keep even, only DOWN (the parity alternation).
    """
    err_inc = 0
    h = 0
    while h < len(levels):
        if len(levels[h]) > C:
            while len(parities) <= h:
                parities.append(0)
            srt = sorted(levels[h])
            keep = srt[parities[h] :: 2]
            parities[h] ^= 1
            if len(levels) <= h + 1:
                levels.append([])
            levels[h + 1].extend(keep)
            levels[h] = []
            err_inc += 1 << h
        h += 1
    return err_inc


def _kll_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    C = _KLL_LEVEL_CAP
    if state.exists:
        vals, lvls, n, err, parities = state.get
        n_levels = (max(lvls) + 1) if lvls else 1
        levels: list[list[int]] = [[] for _ in range(n_levels)]
        for v, h in zip(vals, lvls):
            levels[h].append(int(v))
        parities = list(parities)
    else:
        levels, n, err, parities = [[]], 0, 0, [0]
    for pdf in pdfs:
        if not len(pdf):
            continue
        cents = np.floor(pdf["value"] * 100).astype("int64")
        n += len(cents)
        # weighted insert with ZERO error: a value seen c times enters
        # as one item at every level h where bit h of c is set (weight
        # exactly c), instead of c separate level-0 items — the binary
        # decomposition keeps micro-batch pre-aggregation free
        for v, c in cents.value_counts().items():
            c = int(c)
            h = 0
            while c:
                if c & 1:
                    while len(levels) <= h:
                        levels.append([])
                    levels[h].append(int(v))
                c >>= 1
                h += 1
        err += _kll_compact(levels, parities, C)
    # median: cumulate (value, 2^level) weights in value order
    items = sorted(
        (v, 1 << h) for h, lv in enumerate(levels) for v in lv
    )
    W = sum(w for _, w in items)
    est, cum = None, 0
    for v, w in items:
        cum += w
        if cum >= -(-W // 2):
            est = v
            break
    state.update((
        [v for h, lv in enumerate(levels) for v in lv],
        [h for h, lv in enumerate(levels) for _ in lv],
        int(n),
        int(err),
        [int(p) for p in parities],
    ))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n],
            "est_p50_cents": [est],
            "rank_err_bound": [err],
            "summary_size": [len(items)],
            "n_levels": [len(levels)],
        }
    )


def streaming_quantile_kll(events_stream: DataFrame) -> DataFrame:
    """Running per-type median with a NON-VACUOUS error bound on
    unbounded streams: deterministic KLL-style multi-level summary —
    level h holds items of weight 2^h, capacity 64 per level; overflow
    promotes every other sorted item one level up (weight doubles),
    with a persisted per-level parity bit alternating which offset
    survives (derandomized KLL: reproducible state under WAL replay,
    first-order error cancellation between consecutive compactions).

    This closes the documented bound-looseness of
    ``streaming_quantile_sketch``: that single-level equi-depth summary
    adds ceil(W/C)+1 rank error per compaction with W the TOTAL weight,
    so its budget grows ~linearly in n per epoch and eventually
    exceeds n/2 — sound but vacuous.  Here a compaction at level h
    costs exactly 2^h and level h sees at most n/(C·2^h) compactions,
    so the accumulated budget is ≤ (n/C)·log2(n/C): err/n ≈
    log2(n/C)/C grows only LOGARITHMICALLY — at C=64 it stays under
    40% of n out to n ≈ 2^30 per key (≈ half that in practice from
    the parity cancellation), versus the single-level form crossing
    n/2 within a few thousand same-size batches.  Larger deployments
    raise the level capacity: err/n halves per doubling of C.
    Micro-batch counts enter by binary weight decomposition (value
    seen c times = one item at each set bit of c), so pre-aggregated
    inserts are exact and cost zero budget.

    The single-level sketch remains the right choice when the summary
    must MERGE with the batch ``agg_quantile_sketch_merge`` legs
    (identical compaction rule on both sides); this operator is the
    unbounded-stream upgrade where that compatibility isn't needed.

    Scale notes: state is O(C·log2(n/C)) longs per event type —
    31 levels ≈ 2k longs covers n = 2^36 — and every update is a
    value_counts + list append, no per-row Python in the hot loop
    beyond the Arrow batch the runtime already hands over.
    """
    return events_stream.select("event_type", "value").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _kll_update,
        outputStructType=KLL_OUT_SCHEMA,
        stateStructType=KLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_OUT_SCHEMA = (
    "event_type string, n_seen long, est_distinct long, "
    "n_registers long, n_zero_registers long"
)
HLL_STATE_SCHEMA = "regs array<int>, n long"
_HLL_M = 256  # 2^8 registers; standard error ~1.04/sqrt(m) ≈ 6.5%


def _hll_estimate(regs: list[int]) -> int:
    """Flajolet HLL estimator with the small-range linear-counting
    correction — integer result, pure function of the registers."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        import math

        return int(m * math.log(m / zeros))
    return int(raw)


def _hll_fold(regs: list[int], ids: Iterable) -> None:
    """Fold ids into HLL registers in place (md5 family, max-merge —
    replay-idempotent).  Shared by the running and sliding variants."""
    import hashlib

    for uid in ids:
        h = int.from_bytes(
            hashlib.md5(str(int(uid)).encode()).digest()[:8], "big"
        )
        idx = h & (_HLL_M - 1)
        w = h >> 8  # remaining 56 bits
        rank = 56 - w.bit_length() + 1  # leading zeros + 1
        if rank > regs[idx]:
            regs[idx] = rank


def _hll_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        regs, n = state.get
        regs = list(regs)
    else:
        regs, n = [0] * _HLL_M, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        _hll_fold(regs, pdf["user_id"])
    state.update(([int(r) for r in regs], int(n)))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n],
            "est_distinct": [_hll_estimate(regs)],
            "n_registers": [_HLL_M],
            "n_zero_registers": [regs.count(0)],
        }
    )


def streaming_distinct_estimate(events_stream: DataFrame) -> DataFrame:
    """Running distinct-user estimate per event type in BOUNDED keyed
    state: a 256-register HyperLogLog maintained across micro-batches —
    the streaming twin of the batch ``agg_hll_sketch_union`` query and
    the last member of the streaming sketch family (dedup, top-k,
    quantile, CUSUM, median drift, HLL).

    Register updates are MAX operations, so the state is idempotent
    under replay: reprocessing a batch after an at-least-once restart
    leaves every register unchanged (``n_seen`` is the only
    at-least-once-inflatable field, and it is a row counter, not the
    estimate input).  State is O(m) ints per event type regardless of
    stream length; md5 is the repo's portable hash family, so a batch
    job hashing the same ids reproduces identical registers for offline
    union.  NoTimeout because event types are finite; add a TTL for
    unbounded keys."""
    return events_stream.select("event_type", "user_id").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _hll_update,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SLIDING_HLL_OUT_SCHEMA = (
    "event_type string, window_end_eh long, n_hours_merged long, "
    "est_distinct_window long, n_state_hours long"
)
SLIDING_HLL_STATE_SCHEMA = "hours array<long>, regs array<array<int>>"
_SLIDING_HLL_W = 6  # window = 6 hours ending at the latest seen hour


def _sliding_hll_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        hours, regs = state.get
        hmap = {int(h): list(r) for h, r in zip(hours, regs)}
    else:
        hmap = {}
    saw = False
    for pdf in pdfs:
        if not len(pdf):
            continue
        saw = True
        for eh, grp in pdf.groupby("eh"):
            _hll_fold(
                hmap.setdefault(int(eh), [0] * _HLL_M), grp["user_id"]
            )
    if not saw and not hmap:
        return
    mx = max(hmap)
    # evict hours that can never fall inside a future window ending at
    # ≥ mx (event time is monotone-ish; late data older than the window
    # is dropped exactly like a watermark would drop it)
    hmap = {h: r for h, r in hmap.items() if h > mx - _SLIDING_HLL_W}
    merged = [0] * _HLL_M
    for h, r in hmap.items():
        for i, v in enumerate(r):
            if v > merged[i]:
                merged[i] = v
    keys = sorted(hmap)
    state.update(
        (
            [int(h) for h in keys],
            [[int(v) for v in hmap[h]] for h in keys],
        )
    )
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "window_end_eh": [mx],
            "n_hours_merged": [len(keys)],
            "est_distinct_window": [_hll_estimate(merged)],
            "n_state_hours": [len(keys)],
        }
    )


def streaming_sliding_distinct(events_stream: DataFrame) -> DataFrame:
    """Sliding-window distinct-user estimate per event type in BOUNDED
    keyed state — the streaming twin of the batch
    ``evt_sliding_hll_users`` rollup: one 256-register HLL per (type,
    hour) held in state, the emitted estimate the register UNION of
    the ≤6 hours ending at the latest hour seen, hours older than the
    window EVICTED every batch, so state is O(W·m) ints per key
    forever (``n_state_hours`` is the oracle-checkable boundedness
    witness).  Register folds and unions are max operations →
    replay-idempotent after an at-least-once restart; eviction is
    monotone in the max hour, so replay cannot resurrect an evicted
    hour.  Input must carry ``eh`` (epoch-hour) and ``user_id``."""
    return events_stream.select("event_type", "eh", "user_id").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _sliding_hll_update,
        outputStructType=SLIDING_HLL_OUT_SCHEMA,
        stateStructType=SLIDING_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SLIDING_LOGQ_OUT_SCHEMA = (
    "event_type string, window_end_eh long, n_hours_merged long, "
    "n_events_window long, p50_hist long, p95_hist long, n_state_hours long"
)
SLIDING_LOGQ_STATE_SCHEMA = (
    "hours array<long>, bids array<array<long>>, cnts array<array<long>>"
)
_SLIDING_LOGQ_W = 6  # window = 6 hours ending at the latest seen hour


def logbucket_id(v: int) -> int:
    """Integer-exact HDR-style log bucket: identity below 8, then
    (exponent, 2-bit mantissa) — ≤ 25% relative width, ≤ 4·64 ids over
    the full BIGINT range, and expressible in both Spark SQL and DuckDB
    as pure integer ops (``length(bin(v))`` + shifts), so the batch
    twin query carries a full value oracle with no tolerance boolean.
    Negative values clamp to 0 (the batch twin clamps identically)."""
    v = max(int(v), 0)
    if v < 8:
        return v
    e = v.bit_length()
    return 4 * e + ((v >> (e - 3)) & 3)


def logbucket_lo(b: int) -> int:
    """Lower bound of a :func:`logbucket_id` bucket — the reported
    quantile representative (both engines report the same bound)."""
    b = int(b)
    return b if b < 8 else (4 + b % 4) << (b // 4 - 3)


def _sliding_logq_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        hours, bids, cnts = state.get
        hmap: dict[int, dict[int, int]] = {
            int(h): dict(zip(map(int, bs), map(int, cs)))
            for h, bs, cs in zip(hours, bids, cnts)
        }
    else:
        hmap = {}
    saw = False
    for pdf in pdfs:
        if not len(pdf):
            continue
        saw = True
        pdf = pdf.assign(_bid=pdf["cents"].map(logbucket_id))
        for (eh, bid), n in pdf.groupby(["eh", "_bid"]).size().items():
            hcnt = hmap.setdefault(int(eh), {})
            hcnt[int(bid)] = hcnt.get(int(bid), 0) + int(n)
    if not saw and not hmap:
        return
    mx = max(hmap)
    # same eviction contract as the HLL sibling: hours that can never
    # fall inside a future window ending at >= mx are dropped
    hmap = {h: c for h, c in hmap.items() if h > mx - _SLIDING_LOGQ_W}
    merged: dict[int, int] = {}
    for h in range(mx - _SLIDING_LOGQ_W + 1, mx + 1):
        for b, n in hmap.get(h, {}).items():
            merged[b] = merged.get(b, 0) + n
    tot = sum(merged.values())
    cum = 0
    p50 = p95 = None
    for b in sorted(merged):
        cum += merged[b]
        if p50 is None and 100 * cum >= 50 * tot:
            p50 = logbucket_lo(b)
        if p95 is None and 100 * cum >= 95 * tot:
            p95 = logbucket_lo(b)
    keys = sorted(hmap)
    state.update(
        (
            [int(h) for h in keys],
            [[int(b) for b in sorted(hmap[h])] for h in keys],
            [[int(hmap[h][b]) for b in sorted(hmap[h])] for h in keys],
        )
    )
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "window_end_eh": [mx],
            "n_hours_merged": [len(keys)],
            "n_events_window": [tot],
            "p50_hist": [p50],
            "p95_hist": [p95],
            "n_state_hours": [len(keys)],
        }
    )


def streaming_sliding_value_quantiles(events_stream: DataFrame) -> DataFrame:
    """Sliding-window p50/p95 per event type in BOUNDED keyed state —
    the streaming twin of the batch ``evt_sliding_loghist_quantiles``
    rollup (which in turn is the bounded-histogram variant of
    ``evt_sliding_value_quantiles``): one integer log-bucket histogram
    per (type, hour) held in state, the emitted percentiles read off
    the count-merge of the ≤6 hours ending at the latest hour seen,
    older hours EVICTED every batch — state is O(W · 256) longs per
    key forever (``n_state_hours`` is the boundedness witness).

    The histogram is a pure COUNT structure over a deterministic
    bucket function, so the merged window quantile is independent of
    arrival order and micro-batch boundaries: after any ingest split,
    the final emitted row per window equals the batch twin's row for
    that window bit-for-bit — that equivalence (not a tolerance band)
    is what the pytest asserts, and the batch twin carries the full
    DuckDB value oracle.  Replay safety comes from the state store's
    per-batch versioning (exactly-once state updates under WAL
    restart), same as every applyInPandasWithState op here.  Input
    must carry ``eh`` (epoch-hour) and ``cents`` (integer value)."""
    return events_stream.select("event_type", "eh", "cents").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _sliding_logq_update,
        outputStructType=SLIDING_LOGQ_OUT_SCHEMA,
        stateStructType=SLIDING_LOGQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


JOINSIZE_OUT_SCHEMA = (
    "event_type string, n_seen long, projected_join_size long, "
    "budget long, alarm boolean"
)
JOINSIZE_STATE_SCHEMA = "cnts array<long>, n long"
_CMS_D, _CMS_W = 4, 1024


def _cms_bucket_py(row: int, key: str) -> int:
    """Python twin of the batch CMS bucket expression
    (plans/queries.py:_cms_bucket_sql / the Spark ``conv(substring(
    md5('{r}|' || k), 1, 5), 16, 10) % W`` pattern): first 5 hex digits
    of the seeded md5 as an int, mod width.  Byte-identical buckets are
    the point — a grid maintained in streaming state merges (cell-wise
    add / inner product) with grids built by the batch queries."""
    import hashlib

    return (
        int(hashlib.md5(f"{row}|{key}".encode()).hexdigest()[:5], 16)
        % _CMS_W
    )


def make_join_size_monitor(dim_grid: list[int], budget: int):
    """Build the applyInPandasWithState update function for
    :func:`streaming_join_size_monitor` — the static dim grid and the
    budget ride in the closure (plain ints, cloudpickle-safe)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cnts, n = state.get
            cnts = list(cnts)
        else:
            cnts, n = [0] * (_CMS_D * _CMS_W), 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            for uid in pdf["user_id"]:
                k = str(int(uid))
                for r in range(_CMS_D):
                    cnts[r * _CMS_W + _cms_bucket_py(r, k)] += 1
        # projected |stream ⋈ dim| = min over rows of the inner product
        est = min(
            sum(
                cnts[r * _CMS_W + b] * dim_grid[r * _CMS_W + b]
                for b in range(_CMS_W)
            )
            for r in range(_CMS_D)
        )
        state.update(([int(v) for v in cnts], int(n)))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n],
                "projected_join_size": [int(est)],
                "budget": [int(budget)],
                "alarm": [est > budget],
            }
        )

    return update


def streaming_join_size_monitor(
    events_stream: DataFrame, dim_grid_df: DataFrame, budget: int
) -> DataFrame:
    """Continuous join-size monitoring: per event type, maintain a
    count-min grid of the stream's join keys in bounded state and emit
    the PROJECTED |stream ⋈ dim| after every micro-batch — the min-row
    inner product against a static dimension grid — alarming when the
    projection crosses ``budget``.  The streaming face of
    ``agg_join_size_estimate``: the answer to "if tonight's batch job
    joins today's stream against this dimension, how big is that
    join?", available continuously and BEFORE the join runs.

    ``dim_grid_df`` is the bounded (r, bucket, cnt) cell table of the
    dimension (≤ D·W = 4096 rows whatever the dimension's size) — built
    once per dim snapshot by the same grid rollup the batch query uses,
    collected here into the closure (bounded, the documented
    ``similarity.py`` k-means-sample pattern).  Buckets are
    byte-identical to the batch convention (``_cms_bucket_py``), so the
    stream-side state grid also merges cell-wise with any batch grid.
    One-sided guarantee carries over: the projection never
    underestimates, so a non-alarm is trustworthy; state is
    O(D·W) longs per event type regardless of stream length."""
    rows = dim_grid_df.select("r", "bucket", "cnt").collect()
    grid = [0] * (_CMS_D * _CMS_W)
    for row in rows:
        grid[int(row["r"]) * _CMS_W + int(row["bucket"])] = int(row["cnt"])
    return events_stream.select("event_type", "user_id").groupBy(
        "event_type"
    ).applyInPandasWithState(
        make_join_size_monitor(grid, budget),
        outputStructType=JOINSIZE_OUT_SCHEMA,
        stateStructType=JOINSIZE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_OUT_SCHEMA = (
    "event_type string, n_seen long, n_sketch long, "
    "est_distinct long, kth_hash long"
)
KMV_STATE_SCHEMA = "hs array<long>, ids array<long>, n_seen long"
_KMV_K = 64
_KMV_DOM = 1 << 48


def kmv_hash(user_id: int) -> int:
    """48-bit KMV hash — first 12 md5 hex digits of the decimal id, the
    byte-identical twin of the batch agg_kmv_set_operations hash (and
    of its DuckDB oracle's strpos arithmetic)."""
    import hashlib

    return int(
        hashlib.md5(str(int(user_id)).encode()).hexdigest()[:12], 16
    )


def _kmv_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        hs, ids, n_seen = state.get
        sk = dict(zip(map(int, ids), map(int, hs)))
        n_seen = int(n_seen)
    else:
        sk, n_seen = {}, 0
    saw = False
    for pdf in pdfs:
        if not len(pdf):
            continue
        saw = True
        n_seen += len(pdf)
        for uid in pdf["user_id"].unique():
            uid = int(uid)
            if uid not in sk:
                sk[uid] = kmv_hash(uid)
    if not saw and not sk:
        return
    # keep only the k smallest (h, id): min-k is order-independent and
    # replay-idempotent (re-folding a member is a no-op), so the sketch
    # equals the batch bottom-k over everything ever seen
    keep = sorted(sk.items(), key=lambda kv: (kv[1], kv[0]))[:_KMV_K]
    sk = dict(keep)
    kth = keep[-1][1] if keep else 0
    n_sketch = len(keep)
    est = (
        n_sketch
        if n_sketch < _KMV_K
        else (_KMV_K - 1) * _KMV_DOM // max(kth, 1)
    )
    state.update(
        (
            [int(h) for _, h in keep],
            [int(u) for u, _ in keep],
            n_seen,
        )
    )
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n_seen],
            "n_sketch": [n_sketch],
            "est_distinct": [est],
            "kth_hash": [kth],
        }
    )


def streaming_kmv_distinct(events_stream: DataFrame) -> DataFrame:
    """Streaming KMV (bottom-k) distinct estimate per event type — the
    streaming twin of the batch ``agg_kmv_set_operations`` sketch legs:
    the k smallest 48-bit md5 hashes (ties broken by id) of every user
    ever seen ride in keyed state (O(k) longs per key forever), the
    emitted estimate is the same ``(k-1)*2^48 DIV kth`` integer
    arithmetic, and because min-k is order-independent AND a sketch of
    sketches (min-k of per-batch min-k = global min-k), the final
    emission equals the batch sketch bit-for-bit regardless of
    micro-batch boundaries — which the pytest asserts.  Unlike HLL
    registers, the KMV state doubles as a SAMPLE of member ids, so two
    keys' sketches support union/intersection estimates offline (the
    batch query's set-operation report).  Input must carry ``user_id``."""
    return events_stream.select("event_type", "user_id").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _kmv_update,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
