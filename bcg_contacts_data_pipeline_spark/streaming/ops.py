"""Streaming operators: watermarked windows, session windows, streaming
dedup, and a custom stateful operator.

Green-field relative to the reference (SURVEY §2.9 — it is strictly
batch), but each op is the streaming twin of a batch operator we already
ship, with identical semantics on a finite input:

- tumbling window agg     <-> operators.temporal.tumbling_agg
- session window agg      <-> operators.temporal.sessionize (30-min gap)
- dropDuplicatesWithinWatermark <-> exact dedup (first row per key)
- applyInPandasWithState  <-> groupBy().agg() running totals

Scale notes: all state is keyed and bounded by the watermark, so state
size is O(active keys x watermark horizon), not O(stream length). The
shuffle introduced by each stateful op is the same hash partitioning a
batch groupBy would use; at cluster scale the state store should be
RocksDB-backed. Watermark choice trades completeness vs. state: these
helpers take it as an explicit required argument rather than defaulting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list,
    watermark: str,
) -> DataFrame:
    """Watermarked tumbling-window aggregation. Output columns: window
    start/end flattened to `window_start`/`window_end` plus keys + aggs."""
    w = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("__w"), *keys)
        .agg(*aggs)
    )
    return w.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[c for c in w.columns if c != "__w"],
    )


def session_agg(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: str,
    aggs: list,
    watermark: str,
) -> DataFrame:
    """Gap-based session windows (`session_window`): a session's window is
    [first_event_ts, last_event_ts + gap). Same session boundaries as the
    batch sessionize operator with the same gap."""
    w = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(ts_col, gap).alias("__w"))
        .agg(*aggs)
    )
    return w.select(
        *keys,
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *[c for c in w.columns if c not in (*keys, "__w")],
    )


def dedup_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming exact dedup: emit the first row seen per key; drop
    repeats arriving within the watermark horizon of that first row.
    State per key expires once the watermark passes, so unlike a plain
    streaming dropDuplicates the state store does not grow without bound."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_RUNNING_SCHEMA = "user_id long, n_events long, max_value double"
_STATE_SCHEMA = "n long, mx double"


def _fold_running(
    n: int, mx: float, pdfs: Iterator[pd.DataFrame]
) -> tuple[int, float]:
    """The accumulation both state APIs share — one definition, so the
    legacy and transformWithState twins cannot silently diverge."""
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            m = float(pdf["value"].max())
            mx = m if m > mx else mx
    return n, mx


def _running_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, mx) = state.get if state.exists else (0, float("-inf"))
    n, mx = _fold_running(n, mx, pdfs)
    state.update((n, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, max_value) maintained in keyed state —
    the `applyInPandasWithState` extensibility surface for stateful logic
    the built-in operators can't express. Update output mode: each
    micro-batch emits the new running value for every key it touched.

    Only order-insensitive, exactly-representable stats (count, max) are
    kept so results are deterministic regardless of row order within a
    batch (float summation order is not guaranteed inside a group).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _running_fn,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_static_enrich(
    stream: DataFrame, static: DataFrame, on: list[str]
) -> DataFrame:
    """Stream-static join: enrich each arriving event with a (broadcast)
    static dimension — stateless, append-mode, no watermark needed. The
    static side is re-read per micro-batch by Spark, so a slowly-updated
    profile table is picked up without restarting the stream; broadcast
    keeps the stream side shuffle-free."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(static), on, "left")


def stream_stream_time_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair each left event with the
    right events sharing a key (``left_key = right_key`` — distinct
    column names so the joined frame stays unambiguous) whose timestamp
    lies in ``(left_ts, left_ts + within]`` — click-attribution shape.

    Both sides carry a watermark and the join condition bounds right
    time against left time, so Spark derives state-cleanup thresholds
    for BOTH join buffers: state is O(active keys x (watermark + within))
    rather than the unbounded buffering an unconstrained stream-stream
    join would need. Inner join in append mode emits each matched pair
    exactly once; on a finite AvailableNow drain the result equals the
    batch range join with the same predicate (tests pin this).

    ``how="leftOuter"`` additionally emits each UNMATCHED left event
    (right columns null) — but only once the global watermark passes
    the end of its match window, because until then a matching right
    row could still arrive. Consequence on a finite drain: left rows
    whose window end is at or beyond the final watermark (= min over
    inputs of max event time minus ``watermark`` delay, advanced by the
    trailing no-data micro-batch) are still buffered when the query
    stops and do NOT emit a null row. That is correct streaming
    semantics, not loss — on an unbounded stream they'd emit when the
    watermark caught up; an oracle must mirror the cutoff explicitly.
    """
    allowed = {"inner", "leftOuter"}
    if how not in allowed:
        raise ValueError(f"how must be one of {sorted(allowed)}, got {how!r}")
    if left_key == right_key:
        raise ValueError(
            "rename one side: identical key names make every downstream "
            f"reference to {left_key!r} ambiguous"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)


class _RunningStatsProcessor:
    """StatefulProcessor for transformWithState: per-user running
    (count, max) in a ValueState — the modern (Spark 4) twin of
    _running_fn above, same semantics, same output schema."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            prev = self._state.get()
            n, mx = int(prev[0]), float(prev[1])
        else:
            n, mx = 0, float("-inf")
        n, mx = _fold_running(n, mx, rows)
        self._state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def _have_tws_runtime(spark=None) -> bool:
    """transformWithState's Python state server speaks protobuf; without
    a working google.protobuf the worker crashes with an opaque
    STREAM_FAILED. Checked up front so callers get a clear error (same
    honesty pattern as multimodal's _HAVE_PIL gate).

    The crash is EXECUTOR-side, and driver/executor Python environments
    can differ on a real cluster — so when a session is supplied, the
    probe also runs as a one-partition job on an executor; the
    driver-only import check alone would green-light a cluster whose
    executor images lack protobuf."""

    def probe() -> bool:
        try:
            from google.protobuf import descriptor  # noqa: F401

            return True
        except ImportError:
            return False

    if not probe():
        return False
    if spark is None:
        return True
    return bool(
        spark.sparkContext.parallelize([0], 1).map(lambda _: probe()).first()
    )


def running_user_stats_tws(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, max_value) via ``transformWithState``
    — the Spark 4 arbitrary-state API (typed state handles, timers,
    TTL) that supersedes applyInPandasWithState. Kept NEXT TO the
    legacy twin (`running_user_stats`) with identical semantics so the
    two state APIs are mutually pinned; new stateful operators should
    start from this one where the runtime allows.

    Requires a working ``google.protobuf`` (the API's Python state
    server protocol); raises immediately with a clear message when it
    is absent instead of crashing the streaming worker mid-query.
    """
    if not _have_tws_runtime(stream.sparkSession):
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf (state "
            "server protocol) on driver AND executors; it is unavailable "
            "in this environment — use running_user_stats "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "_RunningStatsProcessorTWS",
        (_RunningStatsProcessor, StatefulProcessor),
        {},
    )
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(),
        outputStructType=_RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Timeout-driven session finalizer (EventTimeTimeout)
# ---------------------------------------------------------------------------

_SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
#: open-session state: start/end in MICROSECONDS since epoch (exact — the
#: source timestamps carry microsecond precision), plus the event count.
_SESSION_STATE_SCHEMA = "start long, end long, n long"


def _session_rows(key, sessions):
    return pd.DataFrame(
        {
            "user_id": [key[0]] * len(sessions),
            "session_start": [
                pd.Timestamp(st, unit="us") for st, _, _ in sessions
            ],
            "session_end": [
                pd.Timestamp(en, unit="us") for _, en, _ in sessions
            ],
            "n_events": [n for _, _, n in sessions],
        }
    )


def _make_session_close_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            st, en, n = state.get
            state.remove()
            yield _session_rows(key, [(st, en, n)])
            return
        ts_us = sorted(
            int(v)
            for pdf in pdfs
            for v in (pdf["ts"].astype("int64") // 1000).tolist()
        )
        if state.exists:
            st, en, n = state.get
        else:
            st = en = None
            n = 0
        closed = []
        for t in ts_us:
            if st is None:
                st, en, n = t, t, 1
            elif t - en > gap_us:
                closed.append((st, en, n))
                st, en, n = t, t, 1
            else:
                # t may be BEFORE the stored session end: the batch is
                # sorted, but an event legal under the watermark can
                # arrive in a LATER micro-batch than a larger ts.
                # max() keeps the end monotone (and the timer with it);
                # st can only move earlier the same way.
                st, en, n = min(st, t), max(en, t), n + 1
        state.update((st, en, n))
        # timeout in MS (the GroupState API's unit), ceil'd so the
        # session cannot fire a hair before its gap truly elapsed
        state.setTimeoutTimestamp(-(-(en + gap_us) // 1000))
        if closed:
            yield _session_rows(key, closed)

    return fn


def session_close_stream(
    stream: DataFrame, ts_col: str, gap: str, watermark: str
) -> DataFrame:
    """Sessionization with EMIT-ON-CLOSE semantics via the explicit
    EventTimeTimeout API — the applyInPandasWithState feature the
    running-stats op doesn't exercise: a session row is emitted ONLY
    when it closes, either because a later same-user event exceeded
    the inactivity gap (intra-batch close) or because the WATERMARK
    passed the open session's ``end + gap`` and the registered timer
    fired (``state.hasTimedOut`` branch, state removed). Contrast with
    ``session_agg`` (built-in session_window): same append-at-close
    result shape, but here the state machine is explicit — the
    template for custom close conditions (budget exhausted, terminal
    event, cross-field predicates) the built-in cannot express.

    Event times are folded in exact MICROSECONDS; only the timer
    registration rounds (ceil) to the API's millisecond unit.
    Per-user event-time order across micro-batches is assumed (holds
    on an AvailableNow drain of a sorted source; a production deploy
    pairs this with a watermark-sized reorder buffer upstream)."""
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_close_fn(gap_us),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="Append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def chained_window_agg(
    stream: DataFrame,
    ts_col: str,
    first_duration: str,
    second_duration: str,
    first_aggs: list,
    second_aggs: list,
    watermark: str,
) -> DataFrame:
    """TWO chained event-time window aggregations in one streaming query
    (Spark >= 3.4 multiple-stateful-operator support): a fine window
    (e.g. hourly) whose finalized rows feed a coarse re-window (e.g.
    daily) downstream — the streaming rollup hierarchy (raw -> hourly ->
    daily) as ONE query with two state stores, instead of two queries
    glued by a sink.

    The chain must preserve event-time lineage: the second groupBy
    windows over ``window_time(window)`` (the struct column, NOT a
    flattened timestamp — flattening drops the watermark metadata and
    Spark rejects the second stateful operator). Append output mode is
    required; each operator finalizes a window when the global watermark
    passes its end, so on a finite AvailableNow drain the emitted coarse
    windows are exactly those whose end <= final watermark — the cutoff
    an oracle states with ``max(ts) - delay``.
    """
    fine = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, first_duration).alias("window"))
        .agg(*first_aggs)
    )
    coarse = fine.groupBy(
        F.window(F.window_time("window"), second_duration).alias("__w2")
    ).agg(*second_aggs)
    return coarse.select(
        F.col("__w2.start").alias("window_start"),
        F.col("__w2.end").alias("window_end"),
        *[c for c in coarse.columns if c != "__w2"],
    )
