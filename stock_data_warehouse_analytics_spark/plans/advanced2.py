"""Advanced batch 2: nearest-direction as-of join, linear gap
interpolation, distribution-drift canary, and the lateral-join SQL
surface.

Shared scale stance: the as-of/interpolation family is the tagged-union
single-shuffle sweep (``joins_advanced.asof_join``); drift compares two
hash-split populations against one broadcast bin table; the lateral join
decorrelates to a ranked window — no per-row subquery execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .joins_advanced import asof_join
from .registry import register


@register(
    "join_asof_nearest_value",
    tags=("join", "asof", "nearest", "window"),
    oracle="""
WITH build AS (
  SELECT user_id, ts, MAX(value) AS near_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
probe AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
matched AS (
  SELECT p.event_id, p.user_id,
         (SELECT b.near_purchase
          FROM build b
          WHERE b.user_id = p.user_id
          ORDER BY ABS(date_diff('microsecond', p.ts, b.ts)), b.ts
          LIMIT 1) AS near_purchase
  FROM probe p
)
SELECT event_id, user_id, near_purchase
FROM matched
ORDER BY user_id, event_id
""",
)
def join_asof_nearest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, ``direction='nearest'`` (pd.merge_asof's third
    direction): every click gets the same user's CLOSEST purchase in
    time, before or after, ties to the earlier row.  Spark plan: both
    directional sweeps as two frames over one partitioning — ONE
    shuffle, one WindowExec — then a per-row distance compare; the
    DuckDB oracle is the literal argmin-|Δt| correlated subquery, which
    DuckDB can afford at sf0.01 and a 100 TB engine cannot (that
    asymmetry is the point of the sweep formulation)."""
    e = load_table(spark, sf_dir, "events")
    build = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("near_purchase"))
    )
    probe = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return (
        asof_join(
            probe,
            build,
            on="user_id",
            value_col="near_purchase",
            direction="nearest",
        )
        .select("event_id", "user_id", "near_purchase")
        .orderBy("user_id", "event_id")
    )


@register(
    "win_linear_interpolate",
    tags=("window", "interpolation", "gap-fill"),
    oracle="""
WITH s AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'purchase' THEN value END AS pv
  FROM events
),
sw AS (
  SELECT event_id, user_id, ts, pv,
    last_value(CASE WHEN pv IS NOT NULL THEN struct_pack(t := ts, v := pv) END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
    first_value(CASE WHEN pv IS NOT NULL THEN struct_pack(t := ts, v := pv) END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
  FROM s
)
SELECT event_id, user_id,
  CASE
    WHEN pv IS NOT NULL THEN pv
    WHEN prev IS NULL OR nxt IS NULL THEN NULL
    WHEN date_diff('microsecond', prev.t, nxt.t) = 0 THEN prev.v
    ELSE prev.v + (nxt.v - prev.v)
         * (CAST(date_diff('microsecond', prev.t, ts) AS DOUBLE)
            / CAST(date_diff('microsecond', prev.t, nxt.t) AS DOUBLE))
  END AS interp_value
FROM sw
ORDER BY user_id, event_id
""",
)
def win_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of a sparse series (pandas
    ``interpolate(method='time')``): purchase values are the knots;
    every other event on the user's timeline gets the value linearly
    interpolated between the surrounding knots (null outside the first/
    last knot).  Same single-shuffle two-frame struct sweep as the
    nearest as-of join — prev and next knot arrive from one WindowExec;
    the blend is plain double arithmetic in one fixed order."""
    e = load_table(spark, sf_dir, "events")
    s = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    knot = F.when(
        F.col("pv").isNotNull(), F.struct(F.col("ts").alias("t"), F.col("pv").alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.last(knot, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.first(knot, ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    sw = s.withColumn("prev", prev).withColumn("nxt", nxt)

    def us(c):  # ts columns read as TIMESTAMP_NTZ; unix_micros wants TIMESTAMP
        return F.unix_micros(c.cast("timestamp"))

    span = us(F.col("nxt.t")) - us(F.col("prev.t"))
    into = us(F.col("ts")) - us(F.col("prev.t"))
    interp = (
        F.when(F.col("pv").isNotNull(), F.col("pv"))
        .when(F.col("prev").isNull() | F.col("nxt").isNull(), F.lit(None))
        .when(span == 0, F.col("prev.v"))
        .otherwise(
            F.col("prev.v")
            + (F.col("nxt.v") - F.col("prev.v"))
            * (into.cast("double") / span.cast("double"))
        )
    )
    return sw.select(
        "event_id", "user_id", interp.alias("interp_value")
    ).orderBy("user_id", "event_id")


_DRIFT_BINS = 10


@register(
    "dq_distribution_drift",
    tags=("warehouse", "dq", "drift", "histogram"),
    oracle=f"""
WITH bounds AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
),
binned AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / {_DRIFT_BINS}))
                              AS BIGINT), {_DRIFT_BINS - 1}) END AS bin,
         event_id % 2 AS pop
  FROM events CROSS JOIN bounds
),
cnt AS (
  SELECT bin,
         COUNT(*) FILTER (WHERE pop = 0) AS c_even,
         COUNT(*) FILTER (WHERE pop = 1) AS c_odd
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(c_even) AS BIGINT) AS t_even,
         CAST(SUM(c_odd) AS BIGINT) AS t_odd
  FROM cnt
),
terms AS (
  SELECT
    ABS(CAST(c_even AS DOUBLE) / t_even - CAST(c_odd AS DOUBLE) / t_odd) AS adiff,
    CASE WHEN c_even + c_odd = 0 THEN 0.0e0
         ELSE (CAST(c_even AS DOUBLE) / t_even - CAST(c_odd AS DOUBLE) / t_odd)
              * (CAST(c_even AS DOUBLE) / t_even - CAST(c_odd AS DOUBLE) / t_odd)
              / (CAST(c_even AS DOUBLE) / t_even + CAST(c_odd AS DOUBLE) / t_odd)
    END AS chi2_term
  FROM cnt CROSS JOIN tot
)
SELECT
  (SELECT t_even FROM tot) AS n_even,
  (SELECT t_odd FROM tot) AS n_odd,
  0.5e0 * CAST(CAST(SUM(CAST(adiff AS DECIMAL(20,15))) AS VARCHAR) AS DOUBLE)
    AS tvd,
  CAST(CAST(SUM(CAST(chi2_term AS DECIMAL(20,15))) AS VARCHAR) AS DOUBLE)
    AS chi2_sym,
  MAX(adiff) AS max_bin_gap
FROM terms
""",
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift canary: split the value column into two
    populations by key hash (even/odd event_id — in production,
    yesterday vs today), histogram both against the SAME global
    {_DRIFT_BINS}-bin grid, and report total-variation distance and
    symmetric chi-square.  Both metrics are pure rational arithmetic —
    no KL/PSI logarithms, whose libm variance would break cross-engine
    equality AND blow up on empty bins.  Plan: one bounds agg
    (broadcast), one {_DRIFT_BINS}-row histogram shuffle, then bounded
    final math; the per-bin terms sum through scale-15 decimals (p,q <
    1: scale 15 spacing 5e-16 still dominates their ulp ~1e-17) with
    the string-routed double conversion."""
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    bounds = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / _DRIFT_BINS
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
            F.lit(_DRIFT_BINS - 1),
        )
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(bin_col.alias("bin"), (F.col("event_id") % 2).alias("pop"))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("pop") == 0, 1)).alias("c_even"),
            F.count(F.when(F.col("pop") == 1, 1)).alias("c_odd"),
        )
    )
    tot = cnt.agg(
        F.sum("c_even").alias("t_even"), F.sum("c_odd").alias("t_odd")
    )
    p = F.col("c_even").cast("double") / F.col("t_even")
    q = F.col("c_odd").cast("double") / F.col("t_odd")
    adiff = F.abs(p - q)
    chi2_term = F.when(F.col("c_even") + F.col("c_odd") == 0, F.lit(0.0)).otherwise(
        (p - q) * (p - q) / (p + q)
    )
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "t_even", "t_odd", adiff.alias("adiff"), chi2_term.alias("chi2_term")
    )

    def dsum15(c: str):
        return F.sum(F.col(c).cast("decimal(20,15)")).cast("string").cast("double")

    return terms.agg(
        F.max("t_even").alias("n_even"),
        F.max("t_odd").alias("n_odd"),
        (F.lit(0.5) * dsum15("adiff")).alias("tvd"),
        dsum15("chi2_term").alias("chi2_sym"),
        F.max("adiff").alias("max_bin_gap"),
    )


_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n
JOIN LATERAL (
  SELECT c.c_custkey, c.c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_custkey
  LIMIT 2
) t ON TRUE
ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


@register(
    "sql_lateral_topk",
    tags=("sql-api", "lateral", "topk", "decorrelation"),
    oracle=_LATERAL_SQL,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — top-2
    customers by balance per nation, written the way an analyst writes
    it.  Catalyst DECORRELATES the lateral into a ranked window over
    one customer scan (no per-nation re-execution); DuckDB runs the
    same text.  The imperative-looking form and the scalable plan are
    the same query — that is the SQL surface's whole value."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
