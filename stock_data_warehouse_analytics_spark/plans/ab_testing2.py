"""A/B experimentation depth: quantile treatment effects and the
streaming SRM monitor's oracle-checked batch twin.

Completes the family in ``ab_testing.py``: means (Welch/CUPED/DiD)
only see the center of the distribution — platforms also report the
TAIL movement (quantile treatment effect, Athey & Imbens style), and
they run the SRM guard continuously per time window, not once per
readout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming.guardrails import srm_windowed
from .ab_testing import _SQL_CENTS, _SQL_VARIANT, _cents, _variant
from .registry import register

_US_1H = 60 * 60 * 1_000_000


@register(
    "eval_ab_quantile_effect",
    tags=("eval", "ab", "quantile", "experiment"),
    oracle=f"""
WITH users AS (
  SELECT user_id,
         {_SQL_VARIANT} AS variant,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN {_SQL_CENTS} END), 0) AS DOUBLE) AS y
  FROM events GROUP BY user_id
),
q AS (
  SELECT variant,
         quantile_cont(y, 0.5) AS p50,
         quantile_cont(y, 0.9) AS p90
  FROM users GROUP BY variant
)
SELECT ROUND(MAX(CASE WHEN variant = 0 THEN p50 END) / 100, 6)
         AS p50_control,
       ROUND(MAX(CASE WHEN variant = 1 THEN p50 END) / 100, 6)
         AS p50_treatment,
       ROUND((MAX(CASE WHEN variant = 1 THEN p50 END)
              - MAX(CASE WHEN variant = 0 THEN p50 END)) / 100, 6)
         AS qte_p50,
       ROUND(MAX(CASE WHEN variant = 0 THEN p90 END) / 100, 6)
         AS p90_control,
       ROUND(MAX(CASE WHEN variant = 1 THEN p90 END) / 100, 6)
         AS p90_treatment,
       ROUND((MAX(CASE WHEN variant = 1 THEN p90 END)
              - MAX(CASE WHEN variant = 0 THEN p90 END)) / 100, 6)
         AS qte_p90
FROM q
""",
)
def eval_ab_quantile_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE TREATMENT EFFECT: p50/p90 of the per-user metric per
    variant and their deltas — the tail readout next to the Welch mean
    (a treatment that moves only whales moves p90 and not p50; a mean
    alone cannot tell).

    Composes the bounded-memory exact-quantile operator
    (``operators/ranking.grouped_exact_quantiles`` — value-bucketed
    rank windows, no group ever buffered) over the same hash-assigned
    user grain as ``eval_ab_welch_ttest``; quantiles interpolate exact
    integer cents in double, so the panel is bit-stable across
    engines.  The final pivot aggregates a 2-row table."""
    from ..operators.ranking import grouped_exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", _cents())
                ),
                F.lit(0),
            )
            .cast("double")
            .alias("y")
        )
        .withColumn("variant", _variant())
    )
    q = grouped_exact_quantiles(
        users.select("variant", "y"),
        "variant",
        "y",
        [("p50", 0.5), ("p90", 0.9)],
    )
    c50 = F.max(F.when(F.col("variant") == 0, F.col("p50")))
    t50 = F.max(F.when(F.col("variant") == 1, F.col("p50")))
    c90 = F.max(F.when(F.col("variant") == 0, F.col("p90")))
    t90 = F.max(F.when(F.col("variant") == 1, F.col("p90")))
    return q.agg(
        F.round(c50 / 100, 6).alias("p50_control"),
        F.round(t50 / 100, 6).alias("p50_treatment"),
        F.round((t50 - c50) / 100, 6).alias("qte_p50"),
        F.round(c90 / 100, 6).alias("p90_control"),
        F.round(t90 / 100, 6).alias("p90_treatment"),
        F.round((t90 - c90) / 100, 6).alias("qte_p90"),
    )


@register(
    "stream_srm_monitor",
    tags=("streaming", "ab", "srm", "guardrail"),
    oracle=f"""
WITH e AS (
  SELECT make_timestamp((epoch_us(ts) // {_US_1H}) * {_US_1H})
           AS window_start,
         {_SQL_VARIANT} AS variant
  FROM events
),
c AS (
  SELECT window_start,
         COUNT(*) FILTER (WHERE variant = 0) AS n_c,
         COUNT(*) FILTER (WHERE variant = 1) AS n_t
  FROM e GROUP BY window_start
),
x AS (
  SELECT window_start, n_c, n_t,
         CAST(n_c + n_t AS DOUBLE) / 2 AS expd
  FROM c
)
SELECT window_start,
       n_c AS n_control,
       n_t AS n_treatment,
       ROUND(((n_c - expd) * (n_c - expd)
              + (n_t - expd) * (n_t - expd)) / expd, 6) AS chi2,
       ROUND(((n_c - expd) * (n_c - expd)
              + (n_t - expd) * (n_t - expd)) / expd, 6) > 3.841459
         AS srm_flag
FROM x
ORDER BY window_start
""",
)
def stream_srm_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly SRM guardrail: per tumbling window, variant traffic
    counts and the chi-square flag — the continuous alarm that catches
    a randomizer breaking MID-experiment (a one-shot SRM check over
    the whole experiment dilutes a transient skew into noise).

    This is the BATCH TWIN of the true readStream monitor
    (``streaming/guardrails.run_srm_stream`` — same ``srm_windowed``
    expressions, watermark + append mode; equivalence pinned by
    ``tests/test_streaming_multimodal.py::
    test_stream_srm_monitor_equals_batch``).  Variant assignment is a
    stateless map-side expression; the windowed count is the only
    state and the watermark bounds it."""
    return srm_windowed(
        load_table(spark, sf_dir, "events"), minutes=60, ordered=True
    )
