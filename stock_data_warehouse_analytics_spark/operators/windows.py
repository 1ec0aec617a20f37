"""Window operators W1–W13 (SURVEY.md §2.6) as reusable helpers.

The reference implements all of these as pandas ``groupby().transform``
/ ``rolling`` calls per ticker (e.g. ``datavisualization.py:277,411-417,
640-644``; ``datamining_analysis.py:70,107,127``).  Here each is a pure
Column expression over ``Window.partitionBy(keys).orderBy(order)`` —
one shuffle per partitioning, evaluated JVM-side, and reused across any
table (stock fact, events, lineitem).

Scale notes:
- Every helper takes explicit partition + order columns; ordering always
  includes a unique tiebreak column upstream so results are
  deterministic under parallel execution (SURVEY.md §4.2 item 7).
- Whole-partition windows (z-score) are two-pass but stay distributed;
  nothing collects to the driver.
- Rolling helpers reproduce pandas ``min_periods=window`` semantics by
  masking with a windowed count (SURVEY.md §4.2 item 3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "ordered_window",
    "partition_window",
    "lead_",
    "lag_pct_change",
    "cumulative_sum",
    "cumulative_product",
    "running_max",
    "drawdown",
    "rolling_mean",
    "rolling_stddev",
    "zscore",
    "temporal_split",
]


def ordered_window(
    partition: Sequence[str | Column], order: Sequence[str | Column]
) -> WindowSpec:
    return Window.partitionBy(*partition).orderBy(*order)


def partition_window(partition: Sequence[str | Column]) -> WindowSpec:
    """Whole-partition (unbounded) frame — W11/W12 z-score flavor."""
    return Window.partitionBy(*partition).orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


def lead_(col: str | Column, w: WindowSpec, n: int = 1) -> Column:
    """W1 — next-row value (datamining_analysis.py:70 ``shift(-1)``)."""
    return F.lead(col, n).over(w)


def lag_pct_change(col: str | Column, w: WindowSpec) -> Column:
    """W2 — pandas ``pct_change()`` (datamining_analysis.py:107)."""
    c = F.col(col) if isinstance(col, str) else col
    return c / F.lag(c, 1).over(w) - 1


def cumulative_sum(col: str | Column, w: WindowSpec) -> Column:
    """W3 — ``groupby().cumsum()`` (datavisualization.py:277)."""
    return F.sum(col).over(w.rowsBetween(Window.unboundedPreceding, 0))


def cumulative_product(col: str | Column, w: WindowSpec) -> Column:
    """W5 — ``cumprod()`` with full pandas semantics
    (datavisualization.py:607).  Spark has no product aggregate, so:
    |product| via exp∘sum∘log|x|, sign via parity of the running
    negative count, zero latching via a running any-zero flag, and
    pandas ``skipna=True`` null behavior (null rows emit null but do
    not contribute downstream — Spark's null-ignoring window sums give
    this for free).

    The naive exp∘sum∘log1p shortcut breaks on the reference's own
    data: the summary panel multiplies ``1 + Return`` with Return in
    *percent*, so factors are routinely negative (SURVEY.md §4.2
    item 2 understates this)."""
    c = F.col(col) if isinstance(col, str) else col
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    n_neg = F.sum(F.when(c < 0, 1).otherwise(0)).over(cum)
    any_zero = F.max(F.when(c == 0, 1).otherwise(0)).over(cum)
    # log(0) is null in Spark and window sums skip nulls, so a zero
    # factor doesn't poison the magnitude — the any_zero latch zeroes
    # the result from that row on, exactly like a true product.
    magnitude = F.exp(F.sum(F.log(F.abs(c))).over(cum))
    sign = F.when(F.pmod(n_neg, F.lit(2)) == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(any_zero == 1, F.lit(0.0)).otherwise(sign * magnitude)
    )


def running_max(col: str | Column, w: WindowSpec) -> Column:
    """W6 — ``cummax()`` (datavisualization.py:608)."""
    return F.max(col).over(w.rowsBetween(Window.unboundedPreceding, 0))


def drawdown(cum_col: Column, w: WindowSpec) -> Column:
    """W7 — (cum − runmax)/runmax (datavisualization.py:607-610)."""
    runmax = F.max(cum_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (cum_col - runmax) / runmax


def _rolling_frame(w: WindowSpec, window: int) -> WindowSpec:
    return w.rowsBetween(-(window - 1), 0)


def _min_periods_mask(col: str | Column, w: WindowSpec, window: int, expr: Column) -> Column:
    """pandas min_periods=window: null until a full window of non-nulls."""
    cnt = F.count(col).over(_rolling_frame(w, window))
    return F.when(cnt >= window, expr)


def rolling_mean(col: str | Column, w: WindowSpec, window: int) -> Column:
    """W9 — rolling mean, pandas min_periods semantics
    (datavisualization.py:640-644 Volume_MA20)."""
    expr = F.avg(col).over(_rolling_frame(w, window))
    return _min_periods_mask(col, w, window, expr)


def rolling_stddev(col: str | Column, w: WindowSpec, window: int) -> Column:
    """W8 — rolling sample std (ddof=1), pandas min_periods semantics
    (datavisualization.py:411-417 RollingVolatility 20/60d)."""
    expr = F.stddev_samp(col).over(_rolling_frame(w, window))
    return _min_periods_mask(col, w, window, expr)


def zscore(col: str | Column, partition: Sequence[str | Column], *, pop: bool = False) -> Column:
    """W11/W12 — z-score over the whole partition.

    ``pop=False`` → pandas ddof=1 (datamining_analysis.py:127);
    ``pop=True``  → sklearn StandardScaler ddof=0
    (datamining_analysis.py:73-75) — the §4.2 item-1 trap.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = partition_window(partition)
    std = (F.stddev_pop if pop else F.stddev_samp)(c).over(w)
    return (c - F.avg(c).over(w)) / std


def temporal_split(
    order_w: WindowSpec,
    partition: Sequence[str | Column],
    frac: float = 0.8,
) -> Column:
    """W13 — deterministic temporal holdout: 'train' for the first
    ``frac`` of each partition in time order, else 'test'
    (datamining_analysis.py:84, shuffle=False split)."""
    rn = F.row_number().over(order_w)
    n = F.count(F.lit(1)).over(partition_window(partition))
    return F.when(rn <= F.floor(n * F.lit(frac)), F.lit("train")).otherwise(
        F.lit("test")
    )
