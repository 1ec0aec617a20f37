"""Sequential per-key recurrences — the operator family that is
deliberately NOT expressible as window frame aggregates.

A recurrence like Wilder's smoothing (``avg_t = (1−α)·avg_{t−1} +
α·x_t``) depends on every prior row, so no fixed window frame computes
it.  The scale-correct Spark shape is a *partitioned sequential scan*:
``groupBy(key).applyInPandas`` — keys fan out across executors
(parallelism = #keys), each key's series is scanned once in Arrow
batches with O(1) state per key.  This is the batch twin of
``applyInPandasWithState``/``transformWithState`` in streaming (the
state there is the same O(1) carry).

What this does NOT do: a recurrence over ONE unpartitioned 100 TB
series.  That is inherently sequential in its data dependency; the
engine's honest answer is per-key parallelism (or the bounded-lookback
approximation in ``plans/technical.py``'s EWMA, which truncates the
(1−α)^j tail so it becomes a frame aggregate).

Differential-tested against an explicit pandas recurrence loop in
``tests/test_technical_differential.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def wilder_rsi(
    df: DataFrame,
    *,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
    value: str = "value",
    period: int = 14,
    out_cols: tuple[str, ...] = ("event_id", "user_id"),
) -> DataFrame:
    """Wilder's RSI with TRUE recursive smoothing (pandas-ta
    convention: ``ewm(alpha=1/period, adjust=False)`` over the
    gain/loss split — the first gain seeds the average, every later row
    folds in with weight α; ``min_periods=period`` diffs before a value
    is emitted).  Contrast ``win_rsi_cutler`` (plans/technical.py),
    the SMA-based relational cousin that IS a frame aggregate.

    RSI = 100·ag/(ag+al); al = 0 ⇒ 100, both 0 (flat window) ⇒ null.

    One shuffle on ``key``; per-key scan is a single Arrow pass with
    O(1) carry — see module docstring for why this shape and not a
    window."""
    import pandas as pd  # noqa: F401 — closure-captured

    out_schema = ", ".join(f"{c} long" for c in out_cols) + ", rsi double"
    order_cols = list(order)
    keep = list(out_cols)
    alpha = 1.0 / period

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_cols)
        diff = pdf[value].astype("float64").diff()
        gain = diff.clip(lower=0.0)
        loss = (-diff).clip(lower=0.0)
        # adjust=False recursive mean, NaN-skipping like pandas ewm:
        # the first non-NaN value seeds, later values fold in with α
        ag = gain.ewm(alpha=alpha, adjust=False, min_periods=period).mean()
        al = loss.ewm(alpha=alpha, adjust=False, min_periods=period).mean()
        denom = ag + al
        rsi = (100.0 * ag / denom).where(denom != 0)
        return pdf[keep].assign(rsi=rsi)

    return df.groupBy(key).applyInPandas(compute, schema=out_schema)
