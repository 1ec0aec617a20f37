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

    Physical shape: ONE shuffle (``repartition(key)`` +
    ``sortWithinPartitions(key, order)``) then a ``mapInPandas`` scan
    that concatenates its partition and runs pandas' *cythonized*
    grouped ewm once per partition — not one interpreted pandas call
    per key (the ``groupBy().applyInPandas`` formulation was ~3×
    slower at 100k rows / 1k keys: per-group Python dispatch dominates
    when groups are small).  Per-partition memory = partition size,
    the same bound every sort-based operator has."""
    import pandas as pd  # noqa: F401 — closure-captured

    out_schema = ", ".join(f"{c} long" for c in out_cols) + ", rsi double"
    order_cols = list(order)
    keep = list(out_cols)
    alpha = 1.0 / period

    def scan(batches):
        chunks = [b for b in batches]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # partition is pre-sorted by (key, order); group boundaries are
        # contiguous, so grouped diff/ewm see each series in order
        keys = pdf[key]
        diff = pdf[value].astype("float64").groupby(keys, sort=False).diff()
        gain = diff.clip(lower=0.0)
        loss = (-diff).clip(lower=0.0)

        def wilder(s: "pd.Series") -> "pd.Series":
            # adjust=False recursive mean, NaN-skipping like pandas
            # ewm: first non-NaN seeds, later values fold in with α —
            # cythonized grouped kernel, one call per partition
            out = (
                s.groupby(keys, sort=False)
                .ewm(alpha=alpha, adjust=False, min_periods=period)
                .mean()
            )
            return out.droplevel(0).sort_index()

        ag, al = wilder(gain), wilder(loss)
        denom = ag + al
        rsi = (100.0 * ag / denom).where(denom != 0)
        yield pdf[keep].assign(rsi=rsi)

    arranged = df.select(*keep, *[c for c in order_cols if c not in keep], value)
    arranged = arranged.repartition(key).sortWithinPartitions(key, *order_cols)
    return arranged.mapInPandas(scan, schema=out_schema)


def holt_linear(
    df: DataFrame,
    *,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
    value: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
    out_cols: tuple[str, ...] = ("event_id", "user_id"),
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) — a TWO-state
    sequential recurrence (``l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1})``,
    ``b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}``; initialized at the SECOND
    point of each key: l₂ = x₂, b₂ = x₂−x₁, first point null)
    that no frame aggregate OR single grouped-ewm call expresses — the
    second member of the partitioned-sequential-scan family after
    :func:`wilder_rsi`.  Carry is O(1) per key; the per-key loop here
    is an explicit Python recurrence over each key's contiguous slice
    (no cython kernel exists for coupled recurrences — honest cost,
    bounded by partition size).  Emits the one-step-ahead forecast
    ``l_t + b_t`` alongside level and trend; rows before the 2-point
    init are null.  Differential-tested against statsmodels-convention
    replays in tests/test_technical_differential.py."""
    import numpy as np  # noqa: F401 — closure-captured
    import pandas as pd  # noqa: F401

    out_schema = (
        ", ".join(f"{c} long" for c in out_cols)
        + ", level double, trend double, forecast double"
    )
    order_cols = list(order)
    keep = list(out_cols)

    def scan(batches):
        import numpy as _np
        import pandas as _pd

        chunks = [b for b in batches]
        if not chunks:
            return
        pdf = _pd.concat(chunks, ignore_index=True)
        x = pdf[value].to_numpy(dtype=_np.float64)
        keys = pdf[key].to_numpy()
        n = len(pdf)
        lvl = _np.full(n, _np.nan)
        trd = _np.full(n, _np.nan)
        start = 0
        for i in range(1, n + 1):
            if i == n or keys[i] != keys[start]:
                if i - start >= 2:
                    l_, b_ = x[start + 1], x[start + 1] - x[start]
                    lvl[start + 1], trd[start + 1] = l_, b_
                    for j in range(start + 2, i):
                        prev = l_
                        l_ = alpha * x[j] + (1 - alpha) * (l_ + b_)
                        b_ = beta * (l_ - prev) + (1 - beta) * b_
                        lvl[j], trd[j] = l_, b_
                start = i
        yield pdf[keep].assign(
            level=lvl, trend=trd, forecast=lvl + trd
        )

    arranged = df.select(*keep, *[c for c in order_cols if c not in keep], value)
    arranged = arranged.repartition(key).sortWithinPartitions(key, *order_cols)
    return arranged.mapInPandas(scan, schema=out_schema)
