"""Misc batch 5: CEP sequence detection, sketch-based join-size
estimation, and the equi-depth histogram.

All three oracle-exact: the CEP picks are deterministic (explicit
(ts, event_id) tiebreaks), the count-min sketches are md5-derived (the
estimate replays identically in DuckDB), and the equi-depth buckets
come from the exact bucketed global rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import hash_int60
from ..sources.tables import load_table
from .registry import register

# ------------------------------------------------------------------ cep

_STEP_US = 30 * 60 * 1_000_000  # each consecutive step within 30 min


@register(
    "events_cep_sequence",
    tags=("behavioral", "cep", "sequence", "funnel"),
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tu FROM events
),
p AS (SELECT event_id AS pid, user_id, tu AS ptu FROM e WHERE event_type = 'purchase'),
c AS (SELECT event_id AS cid, user_id, tu AS ctu FROM e WHERE event_type = 'click'),
v AS (SELECT event_id AS vid, user_id, tu AS vtu FROM e WHERE event_type = 'view'),
pc AS (
  SELECT pid, user_id, ptu, cid, ctu FROM (
    SELECT p.pid, p.user_id, p.ptu, c.cid, c.ctu,
           ROW_NUMBER() OVER (PARTITION BY p.pid
                              ORDER BY c.ctu DESC, c.cid DESC) AS rn
    FROM p JOIN c ON c.user_id = p.user_id
     AND c.ctu <= p.ptu AND p.ptu - c.ctu <= {_STEP_US}
  ) WHERE rn = 1
),
pcv AS (
  SELECT pid, user_id FROM (
    SELECT pc.pid, pc.user_id,
           ROW_NUMBER() OVER (PARTITION BY pc.pid
                              ORDER BY v.vtu DESC, v.vid DESC) AS rn
    FROM pc JOIN v ON v.user_id = pc.user_id
     AND v.vtu <= pc.ctu AND pc.ctu - v.vtu <= {_STEP_US}
  ) WHERE rn = 1
)
SELECT p.user_id,
       COUNT(*) AS n_purchases,
       COUNT(pc.pid) AS n_with_click,
       COUNT(pcv.pid) AS n_full_chains
FROM p
LEFT JOIN pc USING (pid)
LEFT JOIN pcv ON pcv.pid = p.pid
GROUP BY p.user_id
HAVING COUNT(pcv.pid) > 0
ORDER BY p.user_id
""",
)
def events_cep_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing sequence detection — MATCH_RECOGNIZE
    semantics in relational form: purchases completing the strict
    view → click → purchase chain with EACH consecutive step within 30
    minutes (the latest qualifying predecessor picked per step, with
    explicit (ts, event_id) tiebreaks so both engines pick the same
    row).  Two time-bounded user-keyed joins + row_number picks — the
    candidate fan-out is bounded by per-user activity inside the 30-min
    window, never all-pairs; the same shape a streaming CEP engine
    maintains as keyed state.  Output: per user, purchases vs
    click-attributed vs full-chain counts (users with ≥ 1 chain)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))

    def side(t: str, pre: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select(
            F.col("event_id").alias(f"{pre}id"),
            "user_id",
            us.alias(f"{pre}tu"),
        )

    p, c, v = side("purchase", "p"), side("click", "c"), side("view", "v")

    def pick_latest(
        probe: DataFrame, build: DataFrame, pts: str, bts: str, bid: str
    ) -> DataFrame:
        w = Window.partitionBy("pid").orderBy(
            F.desc(bts), F.desc(bid)
        )
        return (
            probe.join(build, "user_id")
            .filter(
                (F.col(bts) <= F.col(pts))
                & (F.col(pts) - F.col(bts) <= _STEP_US)
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    pc = pick_latest(p, c, "ptu", "ctu", "cid").select(
        "pid", "user_id", "ctu"
    )
    pcv = pick_latest(pc, v, "ctu", "vtu", "vid").select("pid")
    return (
        p.join(pc.select("pid", F.lit(1).alias("has_click")), "pid", "left")
        .join(pcv.select("pid", F.lit(1).alias("has_chain")), "pid", "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("has_click").alias("n_with_click"),
            F.count("has_chain").alias("n_full_chains"),
        )
        .filter(F.col("n_full_chains") > 0)
        .orderBy("user_id")
    )


# -------------------------------------------------- join-size estimation

_CM_D, _CM_W = 4, 256  # 4 hash rows x 256 cells
_CM_P = (1 << 31) - 1


def _cm_params() -> list[tuple[int, int]]:
    return [(2 * i + 3, 7 * i + 1) for i in range(_CM_D)]


def _sql_cm(side_cte: str, name: str) -> str:
    rows = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS row_i, "
        f"((({a} * (h % {_CM_P}) + {b}) % {_CM_P}) % {_CM_W}) AS col_j, "
        f"cnt FROM {side_cte}"
        for i, (a, b) in enumerate(_cm_params())
    )
    return f"""{name}_cells AS (
  SELECT row_i, col_j, CAST(SUM(cnt) AS BIGINT) AS c FROM (
{rows}
  ) GROUP BY 1, 2
)"""


@register(
    "sketch_join_size_estimate",
    tags=("sketch", "count-min", "join", "cardinality"),
    oracle=f"""
WITH a0 AS (
  SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) AS h,
         COUNT(*) AS cnt
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
b0 AS (
  SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) AS h,
         COUNT(*) AS cnt
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
{_sql_cm("a0", "a")},
{_sql_cm("b0", "b")},
dots AS (
  SELECT a_cells.row_i, CAST(SUM(a_cells.c * b_cells.c) AS BIGINT) AS dot
  FROM a_cells JOIN b_cells USING (row_i, col_j)
  GROUP BY 1
),
exact AS (
  SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS exact_size
  FROM (SELECT user_id, COUNT(*) AS cnt FROM events
        WHERE event_type = 'click' GROUP BY user_id) a
  JOIN (SELECT user_id, COUNT(*) AS cnt FROM events
        WHERE event_type = 'purchase' GROUP BY user_id) b
  USING (user_id)
)
SELECT (SELECT MIN(dot) FROM dots) AS estimate,
       (SELECT exact_size FROM exact) AS exact_size,
       (SELECT MIN(dot) FROM dots)::DOUBLE
         / (SELECT exact_size FROM exact) AS ratio
""",
)
def sketch_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-SIZE estimation from count-min sketches (the AGMS/CM inner-
    product bound): |A ⋈ B| = Σ_k a_k·b_k is upper-estimated by the
    MINIMUM over hash rows of the sketch dot products Σ_j cmA[i][j]·
    cmB[i][j] — computable from two 4×256 summaries without touching
    either table again, which is how an optimizer prices a join it has
    never run.  Query: clicks-per-user ⋈ purchases-per-user (the
    attribution fan-out).  Deterministic md5-derived hashes make the
    estimate itself oracle-exact; the exact join size rides along so
    the report shows the overestimate ratio (always ≥ 1 — CM is an
    upper bound for inner products of non-negative vectors).  At
    100 TB: cells are mergeable (SUM per (row, col)); the dot product
    is a 1024-row join."""
    e = load_table(spark, sf_dir, "events")

    def per_user(t: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("h", hash_int60(F.col("user_id").cast("string")))
        )

    a0, b0 = per_user("click"), per_user("purchase")

    def cells(side: DataFrame) -> DataFrame:
        hm = F.col("h") % _CM_P
        rows = [
            F.struct(
                F.lit(i).alias("row_i"),
                (((F.lit(a) * hm + F.lit(b)) % _CM_P) % _CM_W).alias("col_j"),
            )
            for i, (a, b) in enumerate(_cm_params())
        ]
        return (
            side.select(
                "cnt", F.explode(F.array(*rows)).alias("rc")
            )
            .groupBy("rc.row_i", "rc.col_j")
            .agg(F.sum("cnt").cast("long").alias("c"))
        )

    ca, cb = cells(a0), cells(b0)
    dots = (
        ca.alias("a")
        .join(cb.alias("b"), ["row_i", "col_j"])
        .groupBy("row_i")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dot"))
    )
    est = dots.agg(F.min("dot").alias("estimate"))
    exact = (
        a0.select("user_id", F.col("cnt").alias("ca"))
        .join(b0.select("user_id", F.col("cnt").alias("cb")), "user_id")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("exact_size"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "estimate",
        "exact_size",
        (
            F.col("estimate").cast("double") / F.col("exact_size").cast("double")
        ).alias("ratio"),
    )


# ------------------------------------------------- equi-depth histogram

_DEPTH_BUCKETS = 8


@register(
    "olap_histogram_equi_depth",
    tags=("olap", "histogram", "quantile", "equi-depth"),
    oracle=f"""
WITH ranked AS (
  SELECT l_extendedprice AS x,
         ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS r,
         COUNT(*) OVER () AS n
  FROM lineitem
)
SELECT CAST(((r - 1) * {_DEPTH_BUCKETS}) // n AS BIGINT) AS bucket,
       COUNT(*) AS n_rows,
       MIN(x) AS lo,
       MAX(x) AS hi
FROM ranked
GROUP BY 1
ORDER BY 1
""",
)
def olap_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (equal row count per bucket, data-dependent
    bin edges) — the optimizer-statistics companion to the equi-width
    histogram: selectivity estimates stay accurate on skewed values
    because every bucket holds the same mass.  Bucket of a row =
    floor((rank−1)·k / n) over the exact global rank — computed by the
    bucketed-rank operator (no single-partition sort), with the full
    (value, orderkey, linenumber) tiebreak so both engines rank
    identically.  Per-bucket count/lo/hi; counts differ by at most one
    row — the equi-depth property, visible in the result."""
    from ..operators.ranking import bucketed_global_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"), "l_orderkey", "l_linenumber"
    )
    ranked, n = bucketed_global_rank(
        li, ["x", "l_orderkey", "l_linenumber"], rank_col="r"
    )
    bucket = F.floor((F.col("r") - 1) * _DEPTH_BUCKETS / F.lit(n)).cast("long")
    return (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
        .orderBy("bucket")
    )
