"""Misc batch 3: sketch calibration and burst detection.

``text_minhash_calibration`` closes the loop on the MinHash family: the
engine doesn't just USE the sketch, it measures the sketch against
ground truth (the honest-measurement practice the rows-only ANN queries
apply via recall tests, here fully oracle-checkable).
``events_burst_detection`` is rate-spike detection over bucketed counts
— the alerting primitive behind every ops dashboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_candidate_pairs,
    minhash_signatures,
    shingle_table,
)
from ..sources.tables import load_table
from .llm_dedup import _sql_minhash_ctes
from .registry import register

_MH_N = 16


@register(
    "text_minhash_calibration",
    tags=("llm", "dedup", "minhash", "calibration"),
    oracle=f"""
WITH {_sql_minhash_ctes()},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT p.doc_a, p.doc_b,
         ROUND(cm.c / (sa.n + sb.n - cm.c), 6) AS true_j
  FROM pairs p
  JOIN common cm ON cm.doc_a = p.doc_a AND cm.doc_b = p.doc_b
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
),
est AS (
  SELECT t.doc_a, t.doc_b, t.true_j,
         ({' + '.join(f'CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END' for i in range(_MH_N))})
           AS matches
  FROM truth t
  JOIN sig a ON a.doc_id = t.doc_a
  JOIN sig b ON b.doc_id = t.doc_b
)
SELECT matches,
       CAST(matches AS DOUBLE) / {_MH_N} AS est_j,
       COUNT(*) AS n_pairs,
       CAST(CAST(SUM(CAST(true_j AS DECIMAL(20,15))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS avg_true_j,
       CAST(CAST(SUM(CAST(ABS(CAST(matches AS DOUBLE) / {_MH_N} - true_j)
                          AS DECIMAL(20,15))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS avg_abs_err
FROM est
GROUP BY matches
ORDER BY matches
""",
)
def text_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration report: for every LSH candidate pair, the
    signature-agreement estimate (matches/{_MH_N}) next to the true
    shingle Jaccard, rolled up per agreement level — how biased is the
    sketch, and is {_MH_N} hashes enough?  E[matches/n] = J is the
    MinHash guarantee; this query MEASURES it on the actual corpus (the
    practice that separates a sketch you trust from one you hope).
    Candidates only — the truth join reuses the inverted-index shingle
    path (df-capped, see operators.dedup.shingle_table — signatures and
    truth share the same capped representation), never all-pairs;
    per-level means sum through scale-15 decimals."""
    from .dedup_store import staged_candidates, staged_shingles, staged_signatures

    sh = staged_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cand = staged_candidates(spark, sf_dir)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    truth = (
        cand.join(common, ["doc_a", "doc_b"])
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6
            ).alias("true_j"),
        )
    )
    sig = staged_signatures(spark, sf_dir)
    siga = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_MH_N)]
    )
    sigb = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_MH_N)]
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(_MH_N)
    )
    est = (
        truth.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .select("true_j", matches.alias("matches"))
    )
    err = F.abs(F.col("matches").cast("double") / _MH_N - F.col("true_j"))

    def dsum15(c):
        return F.sum(c.cast("decimal(20,15)")).cast("string").cast("double")

    return (
        est.groupBy("matches")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (dsum15(F.col("true_j")) / F.count(F.lit(1))).alias("avg_true_j"),
            (dsum15(err) / F.count(F.lit(1))).alias("avg_abs_err"),
        )
        .select(
            "matches",
            (F.col("matches").cast("double") / _MH_N).alias("est_j"),
            "n_pairs",
            "avg_true_j",
            "avg_abs_err",
        )
        .orderBy("matches")
    )


_BURST_US = 10 * 60 * 1_000_000  # 10-minute buckets


@register(
    "events_burst_detection",
    tags=("behavioral", "window", "burst", "anomaly"),
    oracle=f"""
WITH buckets AS (
  SELECT event_type, epoch_us(ts) // {_BURST_US} AS b, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, b, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
                RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS trailing_events,
         MIN(b) OVER (PARTITION BY event_type) AS first_b
  FROM buckets
)
SELECT make_timestamp(b * {_BURST_US}) AS window_start,
       event_type, cnt, trailing_events
FROM w
WHERE b - first_b >= 6 AND 2 * cnt > trailing_events
ORDER BY event_type, window_start
""",
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst detection: 10-minute event-count buckets per type,
    flagged when a bucket exceeds 3× its trailing-hour average
    (2·cnt > Σ trailing — a division-free integer rule, so the alert
    boundary is exact on both engines).  The trailing frame is a RANGE
    window over the bucket INDEX: empty buckets contribute zero without
    materializing gap rows.  Runs on the bucketed table (facts/600s
    rows), one shuffle; the warm-up guard (≥6 prior buckets) uses a
    per-type MIN window on the same partitioning."""
    e = load_table(spark, sf_dir, "events")
    buckets = (
        e.select(
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp")) / _BURST_US)
            .cast("long")
            .alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_trail = (
        Window.partitionBy("event_type").orderBy("b").rangeBetween(-6, -1)
    )
    w_part = Window.partitionBy("event_type")
    flagged = buckets.select(
        "event_type",
        "b",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_trail), F.lit(0)).alias("trailing_events"),
        F.min("b").over(w_part).alias("first_b"),
    )
    return (
        flagged.filter(
            (F.col("b") - F.col("first_b") >= 6)
            & (2 * F.col("cnt") > F.col("trailing_events"))
        )
        .select(
            F.timestamp_micros(F.col("b") * _BURST_US).alias("window_start"),
            "event_type",
            "cnt",
            "trailing_events",
        )
        .orderBy("event_type", "window_start")
    )
