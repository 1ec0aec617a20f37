"""Second OLAP batch: exact percentiles and time-series resampling
(OHLC bars) — warehouse staples beyond the reference's own surface,
both oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import dsum, sql_dsum
from .registry import register


@register(
    "olap_percentiles",
    tags=("agg", "percentile"),
    oracle="""
SELECT
  l_returnflag,
  ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS median_price,
  ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
  ROUND(quantile_cont(l_quantity, 0.5), 6)       AS median_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def olap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (↔ DuckDB
    ``quantile_cont``, same (1−g)·lo + g·hi rule), served from the
    SESSION-STAGED exact-quantile panels (plans/quantile_store.py).

    r10: this query previously ran Spark's exact ``percentile``
    aggregation, which buffers EVERY group's values in its aggregation
    buffer — O(rows per group) heap, not streamable, and measured
    3.2 s steady at sf0.1 (three separate value buffers over 600k
    rows, one task per group).  The staged panel computes the same
    bit-exact interpolated quantiles via the bounded-memory
    bucketed-rank operator (``grouped_exact_quantiles`` — the same
    (1−g)·lo + g·hi expression, parity pinned by the SAME DuckDB
    oracle on ``olap_percentiles_distributed`` since r8), shared with
    the winsorized stats, the sketch audit and the MAD rule.  The
    quantity median extends the panel registry with a
    (lineitem, l_returnflag, l_quantity) entry.  At 100 TB this is
    the only formulation that survives a group covering a third of
    the table; ``olap_approx_percentiles`` remains the sketch path."""
    from .quantile_store import quantile_panel

    price = quantile_panel(
        spark, sf_dir, "lineitem", "l_returnflag", "l_extendedprice"
    ).select(
        "l_returnflag",
        F.round("q50", 6).alias("median_price"),
        F.round("q95", 6).alias("p95_price"),
    )
    qty = quantile_panel(
        spark, sf_dir, "lineitem", "l_returnflag", "l_quantity"
    ).select("l_returnflag", F.round("q50", 6).alias("median_qty"))
    return price.join(qty, "l_returnflag").orderBy("l_returnflag")


@register(
    "olap_percentiles_distributed",
    tags=("agg", "percentile", "scale"),
    oracle="""
SELECT
  l_returnflag,
  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
  ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS p50_price,
  ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def olap_percentiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles with BOUNDED memory
    (:func:`operators.ranking.grouped_exact_quantiles`): value-bucketed
    rank windows + rank-targeted interpolation instead of
    ``percentile``'s buffer-the-group aggregation.  Same answers as
    ``olap_percentiles`` (the oracle is the same ``quantile_cont``),
    but no aggregation buffer ever holds a group — the plan that still
    runs when one return-flag covers a third of 100 TB.  Reads the
    session-staged quantile panel (plans/quantile_store.py): one
    bucketed-rank pass serves this, the winsorized stats, the sketch
    audit and the MAD rule."""
    from .quantile_store import quantile_panel

    out = quantile_panel(
        spark, sf_dir, "lineitem", "l_returnflag", "l_extendedprice"
    )
    return out.select(
        "l_returnflag",
        F.round("q25", 6).alias("p25_price"),
        F.round("q50", 6).alias("p50_price"),
        F.round("q95", 6).alias("p95_price"),
    ).orderBy("l_returnflag")


@register(
    "olap_daily_ohlc",
    tags=("agg", "resample", "ohlc"),
    oracle=f"""
SELECT
  CAST(ts AS DATE) AS day,
  event_type,
  FIRST(value ORDER BY ts, event_id) AS open,
  MAX(value)                         AS high,
  MIN(value)                         AS low,
  LAST(value ORDER BY ts, event_id)  AS close,
  {sql_dsum('value')}                AS volume,
  COUNT(*)                           AS n
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def olap_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to OHLC bars — the canonical stock-
    warehouse downsample (daily bars → weekly bars in the reference's
    domain), here over the events stream.  open/close via
    ``min_by``/``max_by`` on a (ts, event_id) struct — deterministic
    under ties, one grouped agg, mirrored by DuckDB ordered aggregates."""
    e = load_table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "olap_approx_percentiles",
    tags=("agg", "percentile", "sketch"),
    oracle=None,  # approximate sketch — engine-specific, rows-only
)
def olap_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-pass bounded-memory percentile for 100 TB inputs:
    ``approx_percentile`` (Greenwald-Khanna/t-digest style).
    Rows-only (sketch values are engine-specific); the rank-error
    bound is measured in tests/test_fast_aggregates.py::
    test_approx_quantile_audit_bounds and the exact counterpart is
    oracle-checked (olap_percentiles)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
            ).alias("approx_p50_p95")
        )
        .orderBy("l_returnflag")
    )
