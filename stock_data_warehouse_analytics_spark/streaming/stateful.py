"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 extension surface): a per-user running aggregator that
maintains (count, sum, max) across micro-batches with processing-time
timeout — the pattern for any custom sessionizer / online feature
accumulator that ``F.window`` can't express.

Arrow-batched state handoff; state is a single tuple per key (fixed
width), so the state store stays O(active keys) at any input scale.
"""

from __future__ import annotations

import re as _re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "dedup_stream", "ams_register_stream", "sessionize_stream"]

_OUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
_STATE_SCHEMA = "n long, total double, mx double"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, total, mx) = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def dedup_stream(stream: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event delivery on an at-least-once stream:
    ``dropDuplicatesWithinWatermark`` on the event id.

    Plain ``dropDuplicates(['event_id'])`` would only evict state when
    the event-time column is part of the dedup key — with an id-only
    key the state store grows without bound.  The *WithinWatermark*
    variant (Spark 3.5+) evicts an id once the watermark passes its
    first-seen event time, so state is O(events per watermark window)
    at any input scale while still deduplicating ids whose duplicate
    deliveries carry slightly different timestamps."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a stream of events.
    Emits the updated total for each user seen in each micro-batch
    (update semantics)."""
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------ explicit-state AMS registers

_AMS_OUT_SCHEMA = "j integer, z long, n_events long"
_AMS_STATE_SCHEMA = "z long, n long"


def _ams_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (z, n) = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        z += int(pdf["s"].sum())
        n += len(pdf)
    state.update((z, n))
    yield pd.DataFrame({"j": [key[0]], "z": [z], "n_events": [n]})


def ams_register_stream(stream: DataFrame) -> DataFrame:
    """LIFETIME AMS F₂ registers with an EXPLICIT state store — the
    custom-stateful member of the sketch family (the round-6 handoff's
    applyInPandasWithState showcase): each event fans out onto the 16
    estimator axes with its deterministic ±1 sign
    (``sketches.ams_sign_columns`` — the exact ``sketch_ams_f2`` sign
    spec), then ``groupBy(j).applyInPandasWithState`` maintains
    z_j = Σ sign across micro-batches.  Unlike the windowed
    ``ams_daily_sums`` twin (engine-managed SUM state, day-bucketed),
    this keeps the WHOLE-STREAM register in an explicit
    (z, n)-per-axis state tuple — the shape any custom online sketch
    (Count-Min, reservoir, decayed counters) takes when Spark's
    built-in aggregates can't express its update rule.

    Update-mode emission: every micro-batch yields the current
    (j, z, n_events) per touched axis, so downstream sees a live
    register table; the F₂ estimate (square, group-mean, median)
    stays a read-time batch expression over the final registers,
    exactly as in ``sketch_ams_f2``.

    Scale shape: state is EXACTLY 16 rows × two longs regardless of
    event rate or user cardinality (the whole point of AMS); the
    fan-out is map-side (16× row amplification of a 3-column frame,
    no shuffle until the 16-key grouping).  Stream ≡ batch parity:
    tests/test_stateful_skew.py::test_stateful_ams_registers_match_batch."""
    from .sketches import ams_sign_columns

    return (
        ams_sign_columns(stream)
        .groupBy("j")
        .applyInPandasWithState(
            _ams_update,
            outputStructType=_AMS_OUT_SCHEMA,
            stateStructType=_AMS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------- stateful sessionizer (timeout)

_SESS_GAP_US = 6 * 3600 * 1_000_000  # 6 h inactivity gap — must match
#                                      plans/behavioral._GAP_US
_SESS_OUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long,"
    " total_cents long"
)
_SESS_STATE_SCHEMA = "start long, last long, n long, cents long"


def _sess_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    out: list[tuple] = []
    if state.hasTimedOut:
        (start, last, n, cents) = state.get
        out.append((key[0], start, last, n, cents))
        state.remove()
    else:
        evs: list[tuple[int, int]] = []
        for pdf in pdfs:
            evs.extend(
                zip(pdf["us"].astype("int64"), pdf["cents"].astype("int64"))
            )
        evs.sort()
        if state.exists:
            (start, last, n, cents) = state.get
        else:
            start = None  # type: ignore[assignment]
            last = n = cents = 0
        for us, c in evs:
            if start is None:
                start, last, n, cents = us, us, 1, int(c)
            elif us - last > _SESS_GAP_US:
                out.append((key[0], start, last, n, cents))
                start, last, n, cents = us, us, 1, int(c)
            else:
                start = min(start, us)
                last = max(last, us)
                n += 1
                cents += int(c)
        if start is not None:
            # close when event time passes last + gap (ms granularity);
            # if the watermark ALREADY passed it (old events arriving
            # in a later micro-batch), the session is expired on
            # arrival — emit now, a timeout in the past is illegal
            tts = last // 1000 + _SESS_GAP_US // 1000 + 1
            wm = state.getCurrentWatermarkMs()
            if tts <= wm:
                out.append((key[0], start, last, n, cents))
                state.remove()
            else:
                state.update((start, last, n, cents))
                state.setTimeoutTimestamp(tts)
        else:
            state.remove()
    yield pd.DataFrame(
        out,
        columns=["user_id", "start_us", "end_us", "n_events", "total_cents"],
    )


def sessionize_stream(stream: DataFrame, *, watermark: str = "1 minute") -> DataFrame:
    """CUSTOM STATEFUL SESSIONIZER with EVENT-TIME TIMEOUT — the
    operator shape ``F.session_window`` cannot express once the
    per-session logic is custom (here: integer-cent accumulation and
    an explicit closed-session record; in production: per-session ML
    features, abandonment triggers).  One (start, last, n, cents)
    tuple per OPEN session in the state store; a session emits when
    (a) a later same-user event exceeds the {gap}-hour gap — closed by
    SUCCESSOR — or (b) the event-time watermark passes last + gap —
    closed by TIMEOUT (``GroupStateTimeout.EventTimeTimeout``), the
    mechanism that bounds state for users who simply leave.

    Ordering contract: events are sorted WITHIN each micro-batch and
    the watermark bounds cross-batch disorder, the standard streaming
    sessionizer assumption; the stream ≡ batch parity test feeds
    time-ordered files and asserts emitted sessions equal the batch
    gaps-and-islands sessions that are observably closed.

    Scale shape: state is O(open sessions), each a fixed-width tuple;
    the only shuffle is the user_id grouping.

    The watermark delay must be WELL UNDER the {gap}-hour gap:
    ``_sess_update`` folds any within-watermark late event into the
    open session via start=min(start, us), which is correct only while
    lateness < gap — a delay ≥ the gap would let an event older than
    the gap silently MERGE two sessions that batch gaps-and-islands
    logic splits, so that configuration is rejected here rather than
    silently diverging from the batch twin (round-7 ADVICE #2)."""
    if _parse_delay_us(watermark) >= _SESS_GAP_US:
        raise ValueError(
            f"sessionize_stream: watermark delay {watermark!r} must be"
            f" < the session gap ({_SESS_GAP_US // 3_600_000_000} h) —"
            " a late event older than the gap would merge sessions the"
            " batch semantics split"
        )
    return (
        stream.withWatermark("ts", watermark)
        # keep the watermarked ts column itself — event-time timeout
        # requires it to survive into the stateful operator's input
        .select(
            "user_id",
            "ts",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _sess_update,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_DELAY_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86400 * 1_000_000,
    "week": 7 * 86400 * 1_000_000,
}


def _parse_delay_us(delay: str) -> int:
    """Parse a Spark watermark delay string ('1 minute', '30 seconds')
    to microseconds — the same `<number> <unit>[s]` grammar
    CalendarInterval accepts for watermark thresholds.  Used only for
    the sessionizer's delay-vs-gap guard; unknown strings raise so a
    typo can't silently skip the guard."""
    m = _re.fullmatch(
        r"\s*(\d+)\s*([a-z]+?)s?\s*", delay.lower()
    )
    if not m or m.group(2) not in _DELAY_UNIT_US:
        raise ValueError(f"unsupported watermark delay string: {delay!r}")
    return int(m.group(1)) * _DELAY_UNIT_US[m.group(2)]


# derive the doc gap from the constant so the docstring can't go stale
# if _SESS_GAP_US changes (round-7 ADVICE #3)
sessionize_stream.__doc__ = sessionize_stream.__doc__.format(
    gap=_SESS_GAP_US // 3_600_000_000
)
