"""Causal measurement + privacy-release depth: Shapley multi-touch
attribution, stratified-matching ATT, a differentially-private count
release, inter-rater agreement (Cohen's kappa), and split-conformal
prediction intervals.

These close the remaining "decision science on the warehouse" surface
next to the A/B family (``plans/ab_testing*.py``): Shapley is the
game-theoretic attribution the last-touch/time-decay family
approximates; stratified ATT is the observational fallback when no
randomized assignment exists; the DP release is the privacy-budgeted
publication layer; kappa is the agreement audit every labelling
pipeline runs; conformal is the distribution-free interval wrapper
production forecasters ship.

Cross-engine exactness follows the house rules (plans/exact.py
docstring): integer/decimal aggregation, nano/micro-unit quantization
before any cross-engine comparison boundary, and final statistics as
short identically-ordered double op sequences.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import hash_int60
from ..sources.tables import load_table
from .llm_text import _sql_predicted_lang
from ..operators.localrel import literal_df
from .registry import register

_SQL_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


# ---------------------------------------------------------------- Shapley MTA

_CHANNELS = ("click", "error", "signup", "view")  # the non-conversion types


def _shapley_enum() -> list[tuple[str, str, str, int]]:
    """The exact Shapley enumeration for the 4-channel game: for each
    channel i and each subset S of the other channels, the pair of
    coalition signatures (S, S∪{i}) and the weight |S|!·(n−|S|−1)!
    (denominator n! = 24 divided out once at the end).  32 literal rows
    — shared by the Spark plan and the SQL oracle so the two can never
    drift."""
    rows = []
    for ch in _CHANNELS:
        others = [c for c in _CHANNELS if c != ch]
        for r in range(len(others) + 1):
            for s in itertools.combinations(others, r):
                w = math.factorial(len(s)) * math.factorial(
                    len(_CHANNELS) - len(s) - 1
                )
                rows.append(
                    (ch, ",".join(sorted(s)), ",".join(sorted(s + (ch,))), w)
                )
    return rows


_SHAPLEY_FACT = math.factorial(len(_CHANNELS))
_SHAPLEY_VALUES_SQL = ",\n    ".join(
    f"('{c}', '{wo}', '{w}', {w24})" for c, wo, w, w24 in _shapley_enum()
)


@register(
    "attribution_shapley",
    tags=("attribution", "causal", "shapley", "marketing"),
    oracle=f"""
WITH j AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         COALESCE(string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                  FILTER (WHERE event_type != 'purchase'), '') AS sig,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
),
v AS (
  SELECT sig, (SUM(conv) * 1000000000) // COUNT(*) AS v_nano FROM j GROUP BY sig
),
enum(channel, sig_wo, sig_w, w24) AS (VALUES
    {_SHAPLEY_VALUES_SQL}
),
contrib AS (
  SELECT e.channel,
         SUM(e.w24 * (COALESCE(vw.v_nano, 0) - COALESCE(vo.v_nano, 0)))
           AS shapley_nano24
  FROM enum e
  LEFT JOIN v vw ON vw.sig = e.sig_w
  LEFT JOIN v vo ON vo.sig = e.sig_wo
  GROUP BY e.channel
)
SELECT channel, shapley_nano24,
       CAST(shapley_nano24 AS DOUBLE) / {_SHAPLEY_FACT}.0 / 1000000000.0
         AS shapley
FROM contrib ORDER BY channel
""",
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SHAPLEY-value multi-touch attribution over the 4 touch
    channels (click/error/signup/view) — the game-theoretic credit
    split that last-touch (`attribution_last_touch`) and time-decay
    (`attribution_time_decay`) approximate.  Journey grain is
    (user, day): the coalition is the day's set of distinct non-purchase
    touch types, conversion is "any purchase that day", and the
    characteristic function v(S) is the observed conversion rate of
    journeys exposed to EXACTLY coalition S (unobserved coalitions
    contribute v = 0, the standard empirical-MTA convention).

    Exactness: v(S) is nano-unit-quantized with BIGINT floor division,
    the Shapley sum Σ_S |S|!·(n−|S|−1)!·(v(S∪i) − v(S)) stays in
    integer nano·24 units (weights are the exact factorials; the n!
    denominator divides out once at the end), so the only double op is
    the final display division — bit-identical cross-engine.

    Scale shape: one (user, day) grouped agg over the fact table →
    coalition table bounded by 2^|channels| = 16 rows; the Shapley
    enumeration is a 32-row literal relation joined twice against it
    (broadcast); final agg is |channels| rows.  Adding a channel grows
    the literal table 2×, never the fact-side cost."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.array_join(
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.col("event_type") != "purchase", F.col("event_type")
                    )
                )
            ),
            ",",
        ).alias("sig"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    v = j.groupBy("sig").agg(
        F.expr("(sum(conv) * 1000000000) div count(*)").alias("v_nano")
    )
    enum = literal_df(
        spark, _shapley_enum(), "channel string, sig_wo string, sig_w string, w24 long"
    )
    vw = v.select(F.col("sig").alias("sig_w"), F.col("v_nano").alias("vw"))
    vo = v.select(F.col("sig").alias("sig_wo"), F.col("v_nano").alias("vo"))
    return (
        enum.join(vw, "sig_w", "left")
        .join(vo, "sig_wo", "left")
        .groupBy("channel")
        .agg(
            F.sum(
                F.col("w24")
                * (
                    F.coalesce(F.col("vw"), F.lit(0))
                    - F.coalesce(F.col("vo"), F.lit(0))
                )
            )
            .cast("long")
            .alias("shapley_nano24")
        )
        .select(
            "channel",
            "shapley_nano24",
            (
                F.col("shapley_nano24").cast("double")
                / float(_SHAPLEY_FACT)
                / 1_000_000_000.0
            ).alias("shapley"),
        )
        .orderBy("channel")
    )


# -------------------------------------------------- stratified-matching ATT

_ATT_CUT = "2024-01-08"  # pre-period = week 1 (generator pins Jan 2024)
_ATT_ERR_MIN = 3  # treated = ≥3 error events in the pre-period
_ATT_BAND = 4  # stratum = pre-period activity DIV 4, capped
_ATT_CAP = 5


@register(
    "eval_att_stratified",
    tags=("eval", "causal", "matching", "att"),
    oracle=f"""
WITH u AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE ts < TIMESTAMP '{_ATT_CUT}') AS n_pre,
         COUNT(*) FILTER (WHERE ts < TIMESTAMP '{_ATT_CUT}'
                            AND event_type = 'error') AS err_pre,
         COALESCE(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                  FILTER (WHERE ts >= TIMESTAMP '{_ATT_CUT}'
                            AND event_type = 'purchase'), 0) AS post_cents
  FROM events GROUP BY user_id
),
tagged AS (
  SELECT CASE WHEN err_pre >= {_ATT_ERR_MIN} THEN 1 ELSE 0 END AS treated,
         LEAST(n_pre // {_ATT_BAND}, {_ATT_CAP}) AS stratum,
         post_cents
  FROM u
),
s AS (
  SELECT stratum,
         COUNT(*) FILTER (WHERE treated = 1) AS n_treated,
         COUNT(*) FILTER (WHERE treated = 0) AS n_control,
         COALESCE(SUM(post_cents) FILTER (WHERE treated = 1), 0) AS sum_t,
         COALESCE(SUM(post_cents) FILTER (WHERE treated = 0), 0) AS sum_c
  FROM tagged GROUP BY stratum
),
supported AS (
  SELECT *, CAST(SUM(n_treated) OVER () AS BIGINT) AS n_treated_total
  FROM s WHERE n_treated > 0 AND n_control > 0
),
per AS (
  SELECT stratum, n_treated, n_control,
         CAST(sum_t AS DOUBLE) / 100.0 / n_treated AS mean_treated,
         CAST(sum_c AS DOUBLE) / 100.0 / n_control AS mean_control,
         CAST(sum_t AS DOUBLE) / 100.0 / n_treated
           - CAST(sum_c AS DOUBLE) / 100.0 / n_control AS diff,
         CAST(FLOOR((CAST(sum_t AS DOUBLE) / 100.0 / n_treated
                     - CAST(sum_c AS DOUBLE) / 100.0 / n_control)
                    * (CAST(n_treated AS DOUBLE)
                       / CAST(n_treated_total AS DOUBLE))
                    * 1000000000.0) AS BIGINT) AS contrib_nano
  FROM supported
)
SELECT stratum, n_treated, n_control, mean_treated, mean_control, diff,
       contrib_nano,
       CAST(SUM(contrib_nano) OVER () AS DOUBLE) / 1000000000.0 AS att
FROM per ORDER BY stratum
""",
)
def eval_att_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-matching ATT (average treatment effect on the
    treated) — the observational-causal readout when assignment was
    NOT randomized, next to the A/B family's randomized readouts.
    Design: treatment = "≥{err} error events in the pre-period (week
    1)", outcome = post-period purchase spend, strata = pre-period
    activity bands (an entirely PRE-treatment covariate, as matching
    requires).  ATT = Σ_s w_s·(ȳ_t,s − ȳ_c,s) with w_s = n_t,s / N_t
    over common-support strata only (strata missing either arm are
    excluded, the standard positivity trim).

    Exactness: outcomes are exact integer cents; per-stratum means are
    single double divisions of exact sums; each stratum's ATT
    contribution is floor-quantized to nano-units so the cross-stratum
    sum is integer (order-independent).  The two window functions run
    over the STRATUM table — ≤{cap}+1 rows by construction (activity
    band is capped), never the fact table.

    Scale shape: one user-grain grouped agg over the fact scan (the
    same one-fact-pass stance as the A/B metric store), then
    dimension-free arithmetic on ≤{cap}+1 stratum rows."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_ATT_CUT).cast("timestamp")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    u = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("ts") < cut, 1)).alias("n_pre"),
        F.count(
            F.when((F.col("ts") < cut) & (F.col("event_type") == "error"), 1)
        ).alias("err_pre"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("ts") >= cut) & (F.col("event_type") == "purchase"),
                    cents,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("post_cents"),
    )
    tagged = u.select(
        F.when(F.col("err_pre") >= _ATT_ERR_MIN, 1).otherwise(0).alias("treated"),
        F.least(
            F.expr(f"n_pre div {_ATT_BAND}"), F.lit(_ATT_CAP).cast("long")
        ).alias("stratum"),
        "post_cents",
    )
    s = tagged.groupBy("stratum").agg(
        F.count(F.when(F.col("treated") == 1, 1)).alias("n_treated"),
        F.count(F.when(F.col("treated") == 0, 1)).alias("n_control"),
        F.coalesce(
            F.sum(F.when(F.col("treated") == 1, F.col("post_cents"))), F.lit(0)
        )
        .cast("long")
        .alias("sum_t"),
        F.coalesce(
            F.sum(F.when(F.col("treated") == 0, F.col("post_cents"))), F.lit(0)
        )
        .cast("long")
        .alias("sum_c"),
    )
    supported = s.filter((F.col("n_treated") > 0) & (F.col("n_control") > 0))
    w_all = Window.partitionBy()
    supported = supported.withColumn(
        "n_treated_total", F.sum("n_treated").over(w_all).cast("long")
    )
    mean_t = F.col("sum_t").cast("double") / 100.0 / F.col("n_treated")
    mean_c = F.col("sum_c").cast("double") / 100.0 / F.col("n_control")
    diff = mean_t - mean_c
    contrib = F.floor(
        diff
        * (F.col("n_treated").cast("double") / F.col("n_treated_total").cast("double"))
        * 1_000_000_000.0
    ).cast("long")
    per = supported.select(
        "stratum",
        "n_treated",
        "n_control",
        mean_t.alias("mean_treated"),
        mean_c.alias("mean_control"),
        diff.alias("diff"),
        contrib.alias("contrib_nano"),
    )
    return per.withColumn(
        "att",
        F.sum("contrib_nano").over(w_all).cast("double") / 1_000_000_000.0,
    ).orderBy("stratum")


eval_att_stratified.__doc__ = eval_att_stratified.__doc__.format(
    err=_ATT_ERR_MIN, cap=_ATT_CAP
)


# ------------------------------------------------------- DP count release
#
# REPRODUCIBILITY STAND-IN, NOT A PRIVACY GUARANTEE: every noise draw
# in the dq_dp_* family (Laplace via _lap_noise_nano, Gumbel in the
# exponential-mechanism median) is a DETERMINISTIC function of public
# cell names (md5 of 'dpsum:<type>' etc.) so the DuckDB oracle can
# reproduce the release bit-for-bit — meaning anyone can recompute and
# subtract the noise.  The ε accounting, sensitivity calibration, and
# clamping pipelines are the real mechanism shapes; a production
# deployment must substitute a secret-seeded RNG for the draws (one
# line in _lap_noise_nano / the Gumbel expression) for the stated
# (ε, 0)-DP guarantee to actually hold.

_DP_EPS = 0.5  # per-query privacy budget
_DP_DEN = 1 << 48


@register(
    "dq_dp_noisy_counts",
    tags=("dq", "privacy", "differential-privacy", "release"),
    oracle=f"""
WITH base AS (
  SELECT event_type, COUNT(*) AS n_true FROM events GROUP BY event_type
),
noised AS (
  SELECT event_type, n_true,
         (({_SQL_H60.format(x="'dp:' || event_type")}) % {_DP_DEN})::DOUBLE
           AS h
  FROM base
),
lap AS (
  SELECT event_type, n_true,
         CAST(ROUND(
           -(1.0 / {_DP_EPS}) *
           (CASE WHEN (h + 0.5) / {_DP_DEN}.0 - 0.5 >= 0.0
                 THEN 1.0 ELSE -1.0 END) *
           LN(1.0 - 2.0 * ABS((h + 0.5) / {_DP_DEN}.0 - 0.5)) * 1000000000.0,
           0) AS BIGINT) AS noise_nano
  FROM noised
)
SELECT event_type, n_true, noise_nano,
       CAST(n_true * 1000000000 + noise_nano AS DOUBLE) / 1000000000.0
         AS noisy_count,
       {_DP_EPS} AS epsilon, 1 AS l1_sensitivity
FROM lap ORDER BY event_type
""",
)
def dq_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: per-event-type counts with
    Laplace(Δ/ε) noise (Δ = 1 for a count query, ε = {eps}) — the
    publication layer a privacy-budgeted warehouse puts between raw
    facts and external consumers, next to `dq_k_anonymity`'s static
    audit.  Noise is DETERMINISTIC for reproducibility/verification:
    the Laplace draw comes from the inverse CDF
    x = −(Δ/ε)·sgn(u−½)·ln(1−2|u−½|) applied to a 48-bit md5 hash
    uniform of the group key (the `sample_weighted_reservoir` hash-
    uniform primitive; u is offset by ½ lsb so u ≠ ½ and the ln
    argument stays in (0, 1]).  A production release would substitute
    a calibrated RNG — the plan shape (group, noise expression, audit
    columns) is identical.

    Exactness: the uniform, the ln, and the scaling are one fixed
    sequence of double ops on identical inputs (bit-identical across
    engines — the reservoir/PMI precedent), quantized to integer
    nano-units BEFORE the noisy count is assembled, so the published
    value is exact integer arithmetic.

    Scale shape: one grouped count with map-side partial aggregation;
    the noise expression is per-GROUP (5 rows), not per-row."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    h = (
        hash_int60(F.concat(F.lit("dp:"), F.col("event_type"))) % _DP_DEN
    ).cast("double")
    u_centered = (h + 0.5) / float(_DP_DEN) - 0.5
    lap = (
        F.lit(-1.0 / _DP_EPS)
        * F.when(u_centered >= 0.0, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u_centered))
    )
    noise_nano = F.round(lap * 1_000_000_000.0, 0).cast("long")
    return (
        base.select(
            "event_type",
            "n_true",
            noise_nano.alias("noise_nano"),
        )
        .select(
            "event_type",
            "n_true",
            "noise_nano",
            (
                (F.col("n_true") * F.lit(1_000_000_000) + F.col("noise_nano"))
                .cast("double")
                / 1_000_000_000.0
            ).alias("noisy_count"),
            F.lit(_DP_EPS).alias("epsilon"),
            F.lit(1).alias("l1_sensitivity"),
        )
        .orderBy("event_type")
    )


dq_dp_noisy_counts.__doc__ = dq_dp_noisy_counts.__doc__.format(eps=_DP_EPS)


# ------------------------------------------------------------ Cohen's kappa


@register(
    "eval_cohens_kappa",
    tags=("eval", "agreement", "labelling", "kappa"),
    oracle=f"""
WITH cells AS (
  SELECT lang AS a, {_sql_predicted_lang()} AS b, COUNT(*) AS n
  FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT SUM(n) AS n_docs,
         COALESCE(SUM(n) FILTER (WHERE a = b), 0) AS n_agree
  FROM cells
),
marg AS (
  SELECT SUM(r.rn * c.cn) AS pe_num
  FROM (SELECT a, SUM(n) AS rn FROM cells GROUP BY a) r
  JOIN (SELECT b, SUM(n) AS cn FROM cells GROUP BY b) c ON r.a = c.b
)
SELECT n_docs, n_agree, pe_num,
       CAST(n_agree AS DOUBLE) / n_docs AS po,
       CAST(pe_num AS DOUBLE) / n_docs / n_docs AS pe,
       (CAST(n_agree AS DOUBLE) / n_docs
        - CAST(pe_num AS DOUBLE) / n_docs / n_docs)
       / (1.0 - CAST(pe_num AS DOUBLE) / n_docs / n_docs) AS kappa
FROM tot CROSS JOIN marg
""",
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA chance-corrected agreement between the heuristic
    language-ID rater (`functions.text.predicted_lang`) and the gold
    `lang` label — the inter-rater audit every labelling/annotation
    pipeline runs before trusting a classifier or a second annotator
    (`text_langid_confusion` is the underlying table; kappa is its
    decision scalar).  κ = (p_o − p_e)/(1 − p_e) with p_e from the
    confusion marginals.

    Exactness: all counts are exact BIGINTs off one grouped agg; p_o,
    p_e, κ are a short identical double op sequence on those integers
    (Σ row_k·col_k stays BIGINT — safe to ~3·10^9 docs before the
    marginal product needs decimal).

    Scale shape: ONE pass over documents into a |langs|² ≤ 25-cell
    confusion table (map-side partial agg); everything after is
    arithmetic on that bounded table — the one-row report aggregates
    are confusion-table-sized, never corpus-sized."""
    from ..functions.text import with_predicted_lang

    # single-file local scans are ONE partition (round-5 gotcha) — fan
    # the regex-heavy predicted_lang across tasks before evaluating it;
    # r10: scores bound once per row (with_predicted_lang), not
    # re-evaluated through the chained argmax
    d = load_table(spark, sf_dir, "documents").repartition(32)
    cells = (
        with_predicted_lang(d.select("lang", "text"), "text", "b")
        .select(F.col("lang").alias("a"), "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # ≤25 rows, consumed by 3 branches
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.coalesce(F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_agree"),
    )
    rows = cells.groupBy("a").agg(F.sum("n").alias("rn"))
    cols = cells.groupBy("b").agg(F.sum("n").alias("cn"))
    marg = (
        rows.join(cols, rows.a == cols.b)
        .agg(F.sum(F.col("rn") * F.col("cn")).cast("long").alias("pe_num"))
    )
    po = F.col("n_agree").cast("double") / F.col("n_docs")
    pe = F.col("pe_num").cast("double") / F.col("n_docs") / F.col("n_docs")
    return tot.crossJoin(F.broadcast(marg)).select(
        "n_docs",
        "n_agree",
        "pe_num",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


# ------------------------------------------------- split-conformal coverage

_CONF_LAG_H = 24  # seasonal-naive horizon: same hour yesterday
_CONF_ALPHA_NUM = 9  # target coverage 9/10


@register(
    "eval_conformal_coverage",
    tags=("eval", "conformal", "forecast", "uncertainty"),
    oracle=f"""
WITH hours AS (
  SELECT date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts) AS h,
         event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
bounds AS (SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM hours),
spine AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN bounds
  CROSS JOIN UNNEST(generate_series(hmin, hmax)) AS g(h)
),
hourly AS (
  SELECT s.event_type, s.h,
         COALESCE(SUM(x.cents), 0) AS y,
         (SELECT hmin FROM bounds) AS hmin
  FROM spine s
  LEFT JOIN hours x ON x.event_type = s.event_type AND x.h = s.h
  GROUP BY s.event_type, s.h
),
resid AS (
  SELECT event_type, h,
         ABS(y - LAG(y, {_CONF_LAG_H})
                   OVER (PARTITION BY event_type ORDER BY h)) AS r,
         ((h - hmin) // 24) % 2 AS day_parity
  FROM hourly
),
cal AS (
  SELECT event_type, r,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, h) AS rk
  FROM resid WHERE r IS NOT NULL AND day_parity = 0
),
ncal AS (SELECT event_type, COUNT(*) AS n_cal FROM cal GROUP BY event_type),
qhat AS (
  SELECT c.event_type, n.n_cal, c.r AS q_hat_cents
  FROM cal c JOIN ncal n ON n.event_type = c.event_type
  WHERE c.rk = ({_CONF_ALPHA_NUM} * (n.n_cal + 1) + {_CONF_ALPHA_NUM}) // 10
),
ev AS (
  SELECT event_type, r FROM resid WHERE r IS NOT NULL AND day_parity = 1
)
SELECT e.event_type, q.n_cal, COUNT(*) AS n_eval, q.q_hat_cents,
       CAST(COUNT(*) FILTER (WHERE e.r <= q.q_hat_cents) AS DOUBLE)
         / COUNT(*) AS coverage,
       0.9e0 AS target
FROM ev e JOIN qhat q ON q.event_type = e.event_type
GROUP BY e.event_type, q.n_cal, q.q_hat_cents
ORDER BY e.event_type
""",
)
def eval_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction-interval audit over an hourly
    seasonal-naive forecast (ŷ(h) = y(h − 24)) of per-type event value
    — the distribution-free uncertainty wrapper production forecasters
    ship around any point model, next to `eval_forecast_backtest`'s
    point-accuracy readout.  Days alternate calibration/evaluation
    (even/odd day parity — a deterministic split with no scalar
    cutoff); q̂ is the ⌈(1−α)(n+1)⌉-th smallest calibration residual
    (exact integer rank ⌈9(n+1)/10⌉, computed as (9(n+1)+9)//10 so no
    float ceil runs), and the reported coverage is the share of
    held-out residuals within ±q̂ — the finite-sample-valid guarantee
    being verified.

    Exactness: hourly values are exact integer cents on a zero-filled
    hour spine; residuals, ranks and the coverage numerator are all
    BIGINT; the only doubles are the final per-type coverage ratios.

    Scale shape: one grouped agg to (type, hour) grain — calendar ×
    type bounded, not fact-sized; every window is PARTITIONED BY
    event_type (no global sort); the hour spine comes from a one-row
    min/max agg broadcast into a generated sequence."""
    ev = load_table(spark, sf_dir, "events")
    hours = ev.select(
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP '1970-01-01 00:00:00', ts)"
        ).alias("h"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    bounds = hours.agg(F.min("h").alias("hmin"), F.max("h").alias("hmax"))
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            "hmin",
            F.explode(F.sequence(F.col("hmin"), F.col("hmax"))).alias("h"),
        )
    )
    sums = hours.groupBy("event_type", "h").agg(
        F.sum("cents").cast("long").alias("y0")
    )
    hourly = (
        spine.join(sums, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            "hmin",
            F.coalesce(F.col("y0"), F.lit(0)).alias("y"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    resid = hourly.select(
        "event_type",
        "h",
        F.abs(F.col("y") - F.lag("y", _CONF_LAG_H).over(w)).alias("r"),
        (F.expr("(h - hmin) div 24") % 2).alias("day_parity"),
    ).filter(F.col("r").isNotNull())
    cal = resid.filter(F.col("day_parity") == 0)
    rk_w = Window.partitionBy("event_type").orderBy("r", "h")
    cal_rk = cal.withColumn("rk", F.row_number().over(rk_w))
    ncal = cal.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_cal"))
    qhat = (
        cal_rk.join(ncal, "event_type")
        .filter(
            F.col("rk")
            == F.expr(
                f"({_CONF_ALPHA_NUM} * (n_cal + 1) + {_CONF_ALPHA_NUM}) div 10"
            )
        )
        .select("event_type", "n_cal", F.col("r").alias("q_hat_cents"))
    )
    eval_side = resid.filter(F.col("day_parity") == 1)
    return (
        eval_side.join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "q_hat_cents")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            (
                F.count(
                    F.when(F.col("r") <= F.col("q_hat_cents"), 1)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("coverage"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_eval",
            "q_hat_cents",
            "coverage",
            F.lit(0.9).alias("target"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------- k-fold CV via LOFO moments

_CV_FOLDS = 5


@register(
    "eval_kfold_cv_ols",
    tags=("eval", "cross-validation", "regression", "ml"),
    oracle=f"""
WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('cv:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % {_CV_FOLDS} AS fold,
         COUNT(*) AS x,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(ROUND(value * 100, 0) AS BIGINT) END), 0) AS y
  FROM events GROUP BY user_id
),
fm AS (
  SELECT fold, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM u GROUP BY fold
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
         CAST(SUM(sy) AS BIGINT) AS sy, CAST(SUM(sxx) AS BIGINT) AS sxx,
         CAST(SUM(sxy) AS BIGINT) AS sxy
  FROM fm
),
coef AS (
  SELECT f.fold, t.n - f.n AS n_train, f.n AS n_test,
         (CAST(t.n - f.n AS DOUBLE) * (t.sxy - f.sxy)
          - CAST(t.sx - f.sx AS DOUBLE) * (t.sy - f.sy))
         / (CAST(t.n - f.n AS DOUBLE) * (t.sxx - f.sxx)
            - CAST(t.sx - f.sx AS DOUBLE) * (t.sx - f.sx)) AS slope,
         (CAST(t.sy - f.sy AS DOUBLE)
          - ((CAST(t.n - f.n AS DOUBLE) * (t.sxy - f.sxy)
              - CAST(t.sx - f.sx AS DOUBLE) * (t.sy - f.sy))
             / (CAST(t.n - f.n AS DOUBLE) * (t.sxx - f.sxx)
                - CAST(t.sx - f.sx AS DOUBLE) * (t.sx - f.sx)))
            * (t.sx - f.sx))
         / (t.n - f.n) AS intercept
  FROM fm f CROSS JOIN tot t
),
scored AS (
  SELECT u.fold, c.n_train, c.n_test, c.slope, c.intercept,
         CAST(ROUND((u.y - c.intercept - c.slope * u.x)
                    * (u.y - c.intercept - c.slope * u.x) * 1000000.0, 0)
              AS BIGINT) AS sqres_micro
  FROM u JOIN coef c ON c.fold = u.fold
)
SELECT fold, n_train, n_test, slope, intercept,
       SQRT(CAST(SUM(sqres_micro) AS DOUBLE) / 1000000.0 / n_test) AS rmse_cents
FROM scored
GROUP BY fold, n_train, n_test, slope, intercept
ORDER BY fold
""",
)
def eval_kfold_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-FOLD CROSS-VALIDATION of the user-grain OLS spend model
    (y = user purchase cents ~ x = user event count) via the
    LEAVE-ONE-FOLD-OUT moment identity: one pass computes per-fold
    moment tuples (n, Σx, Σy, Σx², Σxy); each fold's TRAINING moments
    are total − fold (no 5× rescans — the algebra production CV
    harnesses use when the model is closed-form), the held fold scores
    the fit, and the readout is per-fold out-of-sample RMSE — the
    overfit audit next to `mining_ols_trend`'s in-sample fit and
    `mining_knn_label_accuracy`'s held-out probe.

    Exactness: folds are md5-hash membership; x, y, and all five
    moments are exact BIGINTs; slope/intercept are one fixed double
    expression per fold; per-row squared residuals are micro-unit
    quantized before the order-free integer sum, and RMSE is the
    final double op.

    Scale shape: one user-grain grouped agg over the facts, a
    {k}-row moment table + one-row total, coefficients broadcast back
    for one scoring pass — two fact-scans total (metric build + score),
    independent of k."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
        )
        .cast("long")
        .alias("y"),
    ).select(
        (
            hash_int60(
                F.concat(F.lit("cv:"), F.col("user_id").cast("string"))
            )
            % _CV_FOLDS
        ).alias("fold"),
        "x",
        "y",
    ).localCheckpoint(eager=True)  # user-grain table feeds moments + scoring
    fm = u.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    tot = fm.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sx").cast("long").alias("tsx"),
        F.sum("sy").cast("long").alias("tsy"),
        F.sum("sxx").cast("long").alias("tsxx"),
        F.sum("sxy").cast("long").alias("tsxy"),
    )
    j = fm.crossJoin(F.broadcast(tot))
    n_tr = (F.col("tn") - F.col("n")).cast("double")
    dsx = F.col("tsx") - F.col("sx")
    dsy = F.col("tsy") - F.col("sy")
    dsxx = F.col("tsxx") - F.col("sxx")
    dsxy = F.col("tsxy") - F.col("sxy")
    slope = (n_tr * dsxy - dsx.cast("double") * dsy) / (
        n_tr * dsxx - dsx.cast("double") * dsx
    )
    intercept = (dsy.cast("double") - slope * dsx) / (F.col("tn") - F.col("n"))
    coef = j.select(
        "fold",
        (F.col("tn") - F.col("n")).alias("n_train"),
        F.col("n").alias("n_test"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )
    res = F.col("y") - F.col("intercept") - F.col("slope") * F.col("x")
    scored = u.join(F.broadcast(coef), "fold").select(
        "fold",
        "n_train",
        "n_test",
        "slope",
        "intercept",
        F.round(res * res * 1_000_000.0, 0).cast("long").alias("sqres_micro"),
    )
    return (
        scored.groupBy("fold", "n_train", "n_test", "slope", "intercept")
        .agg(
            F.sqrt(
                F.sum("sqres_micro").cast("double")
                / 1_000_000.0
                / F.col("n_test")
            ).alias("rmse_cents")
        )
        .orderBy("fold")
    )


eval_kfold_cv_ols.__doc__ = eval_kfold_cv_ols.__doc__.format(k=_CV_FOLDS)


# ------------------------------------------------------- DP family depth

_DP_SUM_CLAMP = 5000  # per-event contribution bound, cents ($50)
_DP_USER_CLAMP = 20000  # per-USER contribution bound, cents ($200)
_DP_HIST_EPS = 0.5  # per-release budget; parallel composition over cells


def _lap_noise_nano(key: F.Column, scale: float) -> F.Column:
    """Deterministic Laplace(scale) draw in integer nano-units from a
    48-bit md5 hash uniform of ``key`` — the ``dq_dp_noisy_counts``
    primitive factored for reuse by the clamped-sum and histogram
    releases (inverse CDF x = −b·sgn(u−½)·ln(1−2|u−½|), u offset by
    ½ lsb so the ln argument stays in (0, 1]).

    Hash-seeded = recoverable: see the section-header note — this is a
    cross-engine reproducibility stand-in; production swaps in a
    secret-seeded RNG here for the DP guarantee to hold."""
    h = (hash_int60(key) % _DP_DEN).cast("double")
    u_centered = (h + 0.5) / float(_DP_DEN) - 0.5
    lap = (
        F.lit(-scale)
        * F.when(u_centered >= 0.0, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u_centered))
    )
    return F.round(lap * 1_000_000_000.0, 0).cast("long")


def _sql_lap_nano(key_sql: str, scale: str) -> str:
    """DuckDB mirror of :func:`_lap_noise_nano` (same op order)."""
    return f"""CAST(ROUND(
           -({scale}) *
           (CASE WHEN (({_SQL_H60.format(x=key_sql)}) % {_DP_DEN} + 0.5)
                        / {_DP_DEN}.0 - 0.5 >= 0.0
                 THEN 1.0 ELSE -1.0 END) *
           LN(1.0 - 2.0 * ABS((({_SQL_H60.format(x=key_sql)}) % {_DP_DEN}
                               + 0.5) / {_DP_DEN}.0 - 0.5))
           * 1000000000.0, 0) AS BIGINT)"""


@register(
    "dq_dp_clamped_sum",
    tags=("dq", "privacy", "differential-privacy", "release", "sum"),
    oracle=f"""
WITH base AS (
  SELECT event_type,
         COUNT(*) AS n_events,
         CAST(SUM(LEAST(GREATEST(CAST(ROUND(value * 100, 0) AS BIGINT), 0),
                        {_DP_SUM_CLAMP})) AS BIGINT) AS true_sum_cents,
         CAST(SUM(CASE WHEN CAST(ROUND(value * 100, 0) AS BIGINT)
                            > {_DP_SUM_CLAMP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped
  FROM events GROUP BY event_type
),
lap AS (
  SELECT event_type, n_events, true_sum_cents, n_clamped,
         {_sql_lap_nano("'dpsum:' || event_type",
                        f"{_DP_SUM_CLAMP}.0 / {_DP_EPS}")} AS noise_nano
  FROM base
)
SELECT event_type, n_events, true_sum_cents, n_clamped, noise_nano,
       CAST(true_sum_cents * 1000000000 + noise_nano AS DOUBLE)
         / 1000000000.0 AS noisy_sum_cents,
       {_DP_EPS} AS epsilon, {_DP_SUM_CLAMP} AS l1_sensitivity_cents
FROM lap ORDER BY event_type
""",
)
def dq_dp_clamped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private CLAMPED-SUM release — the second member
    of the DP publication family after ``dq_dp_noisy_counts``: revenue
    cents per event type, each event's contribution clamped to
    [0, C = {clamp}] so the query's L1 sensitivity is the KNOWN bound C
    (the clamp is what makes a sum releasable at all — unbounded
    contributions have unbounded sensitivity), then Laplace(C/ε) noise
    from the deterministic hash-uniform primitive.  ``n_clamped``
    audits how much signal the bound bites off — the bias/privacy
    trade-off dial an analyst tunes.

    Exactness: clamping, the true sum and the clamp census are pure
    BIGINT arithmetic; the noise draw is the shared
    ``_lap_noise_nano`` op sequence quantized to integer nano-units
    before the release is assembled.

    Scale shape: one grouped agg with map-side partials (clamp is a
    per-row expression); noise is per-GROUP (|event types| rows)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    clamped = F.least(F.greatest(cents, F.lit(0)), F.lit(_DP_SUM_CLAMP))
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(clamped).cast("long").alias("true_sum_cents"),
        F.sum(F.when(cents > _DP_SUM_CLAMP, 1).otherwise(0))
        .cast("long")
        .alias("n_clamped"),
    )
    noise = _lap_noise_nano(
        F.concat(F.lit("dpsum:"), F.col("event_type")),
        float(_DP_SUM_CLAMP) / _DP_EPS,
    )
    return (
        base.withColumn("noise_nano", noise)
        .select(
            "event_type",
            "n_events",
            "true_sum_cents",
            "n_clamped",
            "noise_nano",
            (
                (
                    F.col("true_sum_cents") * F.lit(1_000_000_000)
                    + F.col("noise_nano")
                )
                .cast("double")
                / 1_000_000_000.0
            ).alias("noisy_sum_cents"),
            F.lit(_DP_EPS).alias("epsilon"),
            F.lit(_DP_SUM_CLAMP).alias("l1_sensitivity_cents"),
        )
        .orderBy("event_type")
    )


dq_dp_clamped_sum.__doc__ = dq_dp_clamped_sum.__doc__.format(
    clamp=_DP_SUM_CLAMP
)


@register(
    "dq_dp_daily_histogram",
    tags=("dq", "privacy", "differential-privacy", "release", "histogram"),
    oracle=f"""
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS dmin, MAX(CAST(ts AS DATE)) AS dmax
  FROM events
),
spine AS (
  SELECT t.event_type, dmin + CAST(g.i AS INTEGER) AS d
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN bounds
  CROSS JOIN UNNEST(generate_series(0, date_diff('day', dmin, dmax)))
    AS g(i)
),
base AS (
  SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
cells AS (
  SELECT s.d, s.event_type, CAST(COALESCE(b.n, 0) AS BIGINT) AS n_true
  FROM spine s
  LEFT JOIN base b ON b.d = s.d AND b.event_type = s.event_type
),
lap AS (
  SELECT d, event_type, n_true,
         {_sql_lap_nano("'dph:' || CAST(d AS VARCHAR) || ':' || event_type",
                        f"1.0 / {_DP_HIST_EPS}")} AS noise_nano
  FROM cells
)
SELECT d, event_type, n_true, noise_nano,
       CAST(n_true * 1000000000 + noise_nano AS DOUBLE) / 1000000000.0
         AS noisy_count,
       GREATEST(0.0, CAST(n_true * 1000000000 + noise_nano AS DOUBLE)
                       / 1000000000.0) AS released_count,
       {_DP_HIST_EPS} AS epsilon_per_cell,
       {_DP_HIST_EPS} AS epsilon_total
FROM lap ORDER BY d, event_type
""",
)
def dq_dp_daily_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private DAILY HISTOGRAM release with PARALLEL
    composition accounting: per (day × event type) counts, Laplace(1/ε)
    noise on EVERY cell of the full calendar × type grid — including
    empty ones, because releasing only non-empty cells leaks presence —
    and ``epsilon_total = epsilon_per_cell`` because the cells
    partition the event space (each event falls in exactly ONE day×type
    cell, so the per-cell budgets compose in PARALLEL, not
    sequentially — the accounting fact that makes fine-grained DP
    histograms affordable).  ``released_count`` clamps at 0: a
    post-processing step, free under DP.

    Exactness: the grid is a broadcast min/max + generated integer day
    offsets (the conformal-spine construction at day grain); counts and
    noise quantization are exact integers; the only doubles are the two
    released columns, assembled from integer nano-units identically in
    both engines.

    Scale shape: one grouped count with partial aggregation; the spine
    is calendar × |types| (bounded, not fact-sized) built from a
    one-row broadcast bounds agg; noise is per-CELL expressions, no
    extra shuffle past the left join onto the spine."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("dmin"),
        F.max(F.col("ts").cast("date")).alias("dmax"),
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            "dmin",
            F.explode(
                F.sequence(F.lit(0), F.datediff(F.col("dmax"), F.col("dmin")))
            ).alias("i"),
        )
        .select(
            "event_type", F.date_add(F.col("dmin"), F.col("i")).alias("d")
        )
    )
    base = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    cells = spine.join(base, ["d", "event_type"], "left").select(
        "d",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_true"),
    )
    noise = _lap_noise_nano(
        F.concat(
            F.lit("dph:"),
            F.col("d").cast("string"),
            F.lit(":"),
            F.col("event_type"),
        ),
        1.0 / _DP_HIST_EPS,
    )
    noisy = (
        (F.col("n_true") * F.lit(1_000_000_000) + F.col("noise_nano"))
        .cast("double")
        / 1_000_000_000.0
    )
    return (
        cells.withColumn("noise_nano", noise)
        .select(
            "d",
            "event_type",
            "n_true",
            "noise_nano",
            noisy.alias("noisy_count"),
            F.greatest(F.lit(0.0), noisy).alias("released_count"),
            F.lit(_DP_HIST_EPS).alias("epsilon_per_cell"),
            F.lit(_DP_HIST_EPS).alias("epsilon_total"),
        )
        .orderBy("d", "event_type")
    )


# ------------------------------------------------- streaming conformal gate
# (batch twin; the true readStream path shares the same plan builders —
# streaming/guardrails.py::conformal_qhat / conformal_gate)


@register(
    "stream_conformal_gate",
    tags=("stream", "conformal", "admission", "guardrail"),
    oracle=f"""
WITH sc AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS score,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 2
           AS parity
  FROM events
),
cal AS (
  SELECT event_type, score,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY score, event_id) AS rk
  FROM sc WHERE parity = 0
),
ncal AS (SELECT event_type, COUNT(*) AS n_cal FROM cal GROUP BY event_type),
qhat AS (
  SELECT n.event_type, n.n_cal, c.score AS q_hat_cents
  FROM ncal n LEFT JOIN cal c
    ON c.event_type = n.event_type
   AND c.rk = (9 * (n.n_cal + 1) + 9) // 10
),
ev AS (SELECT event_type, score FROM sc WHERE parity = 1)
SELECT e.event_type, q.n_cal, q.q_hat_cents,
       COUNT(*) AS n_eval,
       CAST(COUNT(*) FILTER (WHERE q.q_hat_cents IS NULL
                                OR e.score <= q.q_hat_cents) AS BIGINT)
         AS n_admitted,
       ROUND(CAST(COUNT(*) FILTER (WHERE q.q_hat_cents IS NULL
                                      OR e.score <= q.q_hat_cents)
                  AS DOUBLE) / COUNT(*), 6) AS admit_rate
FROM ev e LEFT JOIN qhat q ON q.event_type = e.event_type
GROUP BY 1, 2, 3
ORDER BY 1
""",
)
def stream_conformal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CONFORMAL ADMISSION — the stateless production twin of
    ``eval_conformal_coverage``: a batch job fits the per-type
    one-sided conformal threshold q̂ (the ⌈0.9(n+1)⌉-th smallest
    calibration score, even epoch-day parity) and BROADCASTS it into a
    stream-static join; each evaluation event (odd parity) is flagged
    by ``score ≤ q̂`` with NO state store and no watermark — the reason
    platforms split conformal this way is exactly that the online half
    becomes a per-row expression.  This registered twin aggregates the
    gate's per-event flags to the per-type admission summary; the true
    ``readStream`` path runs the IDENTICAL ``conformal_gate`` plan
    (stream ≡ batch pinned by tests/test_streaming_multimodal.py::
    test_stream_conformal_gate_equals_batch).

    Exactness: scores are integer cents; the rank is the exact integer
    (9(n+1)+9)//10 (no float ceil); counts are BIGINT and the only
    double is the final admit_rate ratio, rounded at 6 dp.
    Under-calibrated types (rank > n_cal, i.e. n_cal < 18) carry the
    NULL/+∞ admit-all sentinel rather than dropping from the join —
    both engines encode the identical convention, and
    tests/test_streaming_multimodal.py pins the small-n case.

    Scale shape: the calibration fit is one per-type window rank over
    the calibration half (partitioned, no global sort) → a |types|-row
    broadcast; the gate itself is map-side only (broadcast join + row
    expressions) — at stream scale, per-event cost is O(1) with zero
    shuffle, which is the property being certified."""
    from ..streaming.guardrails import conformal_gate, conformal_qhat

    ev = load_table(spark, sf_dir, "events")
    gate = conformal_gate(ev, conformal_qhat(ev))
    return (
        gate.groupBy("event_type", "n_cal", "q_hat_cents")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.count(F.when(F.col("admitted"), 1))
            .cast("long")
            .alias("n_admitted"),
            F.round(
                F.count(F.when(F.col("admitted"), 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("admit_rate"),
        )
        .select(
            "event_type",
            "n_cal",
            "q_hat_cents",
            "n_eval",
            "n_admitted",
            "admit_rate",
        )
        .orderBy("event_type")
    )


# (dq_dp_budget_ledger lives at the end of this file — it must follow
#  every dq_dp_* release whose constants it enumerates)


# ------------------------------------------- DP median (exponential mech.)

_DPM_DEN = 1 << 48


@register(
    "dq_dp_exponential_median",
    tags=("dq", "privacy", "differential-privacy", "exponential", "median"),
    oracle=f"""
WITH ev AS (
  SELECT event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) // 100 AS band
  FROM events
),
bands AS (SELECT DISTINCT band FROM ev),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
cnt AS (SELECT event_type, band, COUNT(*) AS c FROM ev GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, b.band, COALESCE(c.c, 0) AS c, t.n
  FROM n t CROSS JOIN bands b
  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.band = b.band
),
cum AS (
  SELECT event_type, band, n,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY band)
              AS BIGINT) AS cle
  FROM grid
),
scored AS (
  SELECT event_type, band, n, cle,
         -ABS(2 * cle - n) AS u,
         -LN(-LN((({_SQL_H60.format(
             x="'dpmed:' || event_type || ':' || CAST(band AS VARCHAR)")})
            % {_DPM_DEN} + 0.5) / {_DPM_DEN}.0)) AS g
  FROM cum
),
ranked AS (
  SELECT event_type, band, n, u,
         CAST(ROUND((({_DP_EPS} / 2.0) * CAST(u AS DOUBLE) + g)
                    * 1000000000, 0) AS BIGINT) AS score_nano,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(ROUND((({_DP_EPS} / 2.0) * CAST(u AS DOUBLE) + g)
                               * 1000000000, 0) AS BIGINT) DESC, band
         ) AS rk
  FROM scored
),
truemed AS (
  SELECT event_type, MIN(band) AS true_median_band
  FROM cum WHERE 2 * cle >= n GROUP BY event_type
)
SELECT r.event_type, r.n, r.band AS released_band, r.u AS utility,
       r.score_nano, t.true_median_band, {_DP_EPS} AS epsilon
FROM ranked r JOIN truemed t ON t.event_type = r.event_type
WHERE r.rk = 1
ORDER BY r.event_type
""",
)
def dq_dp_exponential_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private MEDIAN release via the EXPONENTIAL
    MECHANISM (McSherry & Talwar 2007) — the third mechanism class in
    the DP family after the two Laplace releases, for statistics where
    adding noise to the VALUE is meaningless: the released object is a
    SELECTION among candidate outputs (dollar bands of per-event
    value), drawn with P(b) ∝ exp(ε·u(b)/(2Δu)).  Utility is the
    integer rank error u(b) = −|2·#{{x ≤ b}} − n| (sensitivity Δu = 1:
    one added/removed record moves 2·cnt−n by exactly ±1), and the
    draw uses the GUMBEL-MAX trick — argmax of score + Gumbel noise
    g = −ln(−ln(U)) IS an exact sample from the softmax — with the
    deterministic hash-uniform U of the (type, band) key, the same
    reproducibility stance as the Laplace releases.  The exact median
    band rides along as the utility audit.

    Exactness: utilities and cumulative counts are BIGINT on the
    zero-filled type × band grid; the score is one identically-ordered
    double expression (LN twice, one multiply-add) quantized to
    integer nano-units BEFORE the per-type argmax rank, with band as
    the full tiebreak.

    Scale shape: one grouped count to (type, band) grain (map-side
    partials, never fact-sized output), a per-type cumsum window over
    the bounded band domain, and a per-type top-1 rank — the same
    bounded-grid discipline as `dq_dp_daily_histogram`."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(ROUND(value * 100, 0) AS BIGINT) div 100"
        ).alias("band"),
    )
    bands = ev.select("band").distinct()
    n = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cnt = ev.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = (
        n.crossJoin(F.broadcast(bands))
        .join(cnt, ["event_type", "band"], "left")
        .select(
            "event_type",
            "band",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "event_type",
        "band",
        "n",
        F.sum("c").over(wc).cast("bigint").alias("cle"),
    )
    u = -F.abs(2 * F.col("cle") - F.col("n"))
    u01 = (
        hash_int60(
            F.concat(
                F.lit("dpmed:"),
                F.col("event_type"),
                F.lit(":"),
                F.col("band").cast("string"),
            )
        )
        % _DPM_DEN
        + 0.5
    ) / float(_DPM_DEN)
    g = -F.log(-F.log(u01))
    score_nano = F.round(
        ((F.lit(_DP_EPS) / 2.0) * u.cast("double") + g) * 1_000_000_000, 0
    ).cast("bigint")
    scored = cum.select(
        "event_type",
        "band",
        "n",
        u.alias("u"),
        score_nano.alias("score_nano"),
        F.col("cle"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("score_nano"), "band"
    )
    picked = (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n",
            F.col("band").alias("released_band"),
            F.col("u").alias("utility"),
            "score_nano",
        )
    )
    truemed = (
        cum.filter(2 * F.col("cle") >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("band").alias("true_median_band"))
    )
    return (
        picked.join(F.broadcast(truemed), "event_type")
        .select(
            "event_type",
            "n",
            "released_band",
            "utility",
            "score_nano",
            "true_median_band",
            F.lit(_DP_EPS).alias("epsilon"),
        )
        .orderBy("event_type")
    )


@register(
    "dq_dp_user_level_sum",
    tags=("dq", "privacy", "differential-privacy", "release", "user-level"),
    oracle=f"""
WITH per_user AS (
  SELECT event_type, user_id,
         LEAST(GREATEST(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                             AS BIGINT), 0), {_DP_USER_CLAMP}) AS contrib,
         CASE WHEN CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                        AS BIGINT) > {_DP_USER_CLAMP}
              THEN 1 ELSE 0 END AS clamped
  FROM events GROUP BY event_type, user_id
),
base AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(contrib) AS BIGINT) AS true_sum_cents,
         CAST(SUM(clamped) AS BIGINT) AS n_users_clamped
  FROM per_user GROUP BY event_type
),
lap AS (
  SELECT event_type, n_users, true_sum_cents, n_users_clamped,
         {_sql_lap_nano("'dpusum:' || event_type",
                        f"{_DP_USER_CLAMP}.0 / {_DP_EPS}")} AS noise_nano
  FROM base
)
SELECT event_type, n_users, true_sum_cents, n_users_clamped, noise_nano,
       CAST(true_sum_cents * 1000000000 + noise_nano AS DOUBLE)
         / 1000000000.0 AS noisy_sum_cents,
       {_DP_EPS} AS epsilon, {_DP_USER_CLAMP} AS user_l1_sensitivity_cents
FROM lap ORDER BY event_type
""",
)
def dq_dp_user_level_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-LEVEL differentially-private sum — the variant of
    ``dq_dp_clamped_sum`` whose privacy unit is the PERSON, not the
    event: each user's TOTAL contribution per event type is clamped to
    [0, C = {clamp}] BEFORE aggregation, so adding or removing one
    user (all their events at once — the neighboring relation GDPR
    semantics actually require) moves the sum by at most C, and
    Laplace(C/ε) calibrates to that.  Event-level DP under-protects
    anyone with many events; this is the release a privacy review
    signs off on, with the clamp-bite census as the bias audit.

    Exactness: per-user totals, clamping and the census are BIGINT;
    the noise draw is the shared ``_lap_noise_nano`` sequence
    quantized to nano-units before assembly.

    Scale shape: one (type, user) grouped sum (map-side partials) —
    the contribution-bounding pattern every user-level DP system runs
    — then a |types|-row aggregate; noise is per-GROUP."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(cents).cast("long").alias("raw")
    ).select(
        "event_type",
        F.least(
            F.greatest(F.col("raw"), F.lit(0)), F.lit(_DP_USER_CLAMP)
        ).alias("contrib"),
        F.when(F.col("raw") > _DP_USER_CLAMP, 1).otherwise(0).alias(
            "clamped"
        ),
    )
    base = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("contrib").cast("long").alias("true_sum_cents"),
        F.sum("clamped").cast("long").alias("n_users_clamped"),
    )
    noise = _lap_noise_nano(
        F.concat(F.lit("dpusum:"), F.col("event_type")),
        float(_DP_USER_CLAMP) / _DP_EPS,
    )
    return (
        base.withColumn("noise_nano", noise)
        .select(
            "event_type",
            "n_users",
            "true_sum_cents",
            "n_users_clamped",
            "noise_nano",
            (
                (
                    F.col("true_sum_cents") * F.lit(1_000_000_000)
                    + F.col("noise_nano")
                )
                .cast("double")
                / 1_000_000_000.0
            ).alias("noisy_sum_cents"),
            F.lit(_DP_EPS).alias("epsilon"),
            F.lit(_DP_USER_CLAMP).alias("user_l1_sensitivity_cents"),
        )
        .orderBy("event_type")
    )


dq_dp_user_level_sum.__doc__ = dq_dp_user_level_sum.__doc__.format(
    clamp=_DP_USER_CLAMP
)


# --------------------------------------- DP discrete Gaussian (zCDP)

# Discrete Gaussian mechanism (Canonne, Kamath & Steinke, "The
# Discrete Gaussian for Differential Privacy", NeurIPS 2020): noise on
# the INTEGERS with P[Z = z] ∝ exp(−z²/2σ²) — the mechanism of choice
# when many releases compose (ρ-zCDP adds linearly and converts to a
# far tighter (ε, δ) than Laplace's pure-ε under k-fold composition),
# and the one real DP deployments (US Census TopDown) ship.
#
# Integer sampler (the verdict's "rational arithmetic" requirement):
# the weight table w(z) = round(2⁴⁰·exp(−z²/2σ²)) is computed ONCE in
# Python at module load and embedded as INTEGER literals in both
# engines' plans, so neither engine evaluates exp() — the draw is pure
# BIGINT inverse-CDF arithmetic (u = h₆₀ mod T, z = #{cum ≤ u} − B) on
# identical literals and is bit-exact by construction.  The 2⁻⁴⁰
# weight quantization and the u-mod-T bias (T ≈ 2⁴⁵·7, h₆₀ is 60-bit:
# bias < 2⁻¹⁴ per cell) perturb the sampled distribution negligibly
# relative to σ = 20; the hash-seeded determinism itself is the usual
# reproducibility stand-in (see the section-header note above
# _DP_EPS).
_DG_SIGMA = 20  # noise stddev in counts; Δ = 1 for a count query
_DG_B = 150  # support truncation: |z| ≤ 7.5σ (tail mass < 2⁻⁴⁰ lost
#              to weight quantization anyway — w(z) = 0 beyond ±150)
_DG_CUMS: list[int] = []
_dg_c = 0
for _dg_z in range(-_DG_B, _DG_B + 1):
    _dg_c += round(
        (1 << 40) * math.exp(-(_dg_z * _dg_z) / (2.0 * _DG_SIGMA**2))
    )
    _DG_CUMS.append(_dg_c)
_DG_T = _DG_CUMS[-1]
_DG_RHO = 1.0 / (2 * _DG_SIGMA**2)  # zCDP: ρ = Δ²/2σ² = 0.00125
# standard zCDP→(ε,δ) conversion ε = ρ + 2√(ρ·ln(1/δ)) at δ = 1e-6,
# rounded to 6 dp and embedded as the SAME literal in both engines
_DG_EPS_1E6 = round(_DG_RHO + 2 * math.sqrt(_DG_RHO * math.log(1e6)), 6)
_DG_CUM_SQL = "[" + ",".join(str(c) for c in _DG_CUMS) + "]"


@register(
    "dq_dp_discrete_gaussian_counts",
    tags=("dq", "privacy", "differential-privacy", "zcdp", "release"),
    oracle=f"""
WITH base AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM events GROUP BY event_type
),
u AS (
  SELECT event_type, n_true,
         ({_SQL_H60.format(x="'dgauss:' || event_type")}) % {_DG_T} AS u
  FROM base
)
SELECT event_type, n_true,
       CAST(len(list_filter({_DG_CUM_SQL}, c -> c <= u)) - {_DG_B}
            AS BIGINT) AS z_noise,
       n_true + CAST(len(list_filter({_DG_CUM_SQL}, c -> c <= u)) - {_DG_B}
                     AS BIGINT) AS noisy_count,
       {_DG_SIGMA} AS sigma,
       {_DG_RHO}e0 AS rho_zcdp,
       {_DG_EPS_1E6}e0 AS epsilon_at_delta_1e6
FROM u ORDER BY event_type
""",
)
def dq_dp_discrete_gaussian_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discrete-Gaussian count release — the THIRD mechanism class in
    the DP family (after Laplace and the exponential mechanism) and
    the composition-friendly one: per-event-type counts with integer
    noise Z ~ N_Z(0, σ²={sigma}²), giving ρ-zCDP with ρ = Δ²/2σ² =
    {rho} per release (Canonne-Kamath-Steinke 2020; US Census TopDown
    is the production precedent).  Under k releases ρ adds LINEARLY
    and converts to (ε, δ) far tighter than Laplace's pure-ε sum —
    the reason a warehouse issuing many releases standardizes on
    Gaussian noise; the ledger row carries the δ=1e-6 conversion
    ε = ρ + 2√(ρ·ln 1e6) = {eps}.

    Exactness: the weight table round(2⁴⁰·exp(−z²/2σ²)) for z in
    [−{b}, {b}] is computed once in PYTHON and embedded as integer
    literals in both engines, so the inverse-CDF draw
    z = #{{cum ≤ h₆₀ mod T}} − {b} is pure BIGINT arithmetic on
    identical constants — no cross-engine exp/erf anywhere; the noisy
    count is integer addition.  Noise is hash-seeded for cross-engine
    reproducibility (a stand-in, not a guarantee — see the family
    note above _DP_EPS).

    Scale shape: one grouped count with map-side partials; the sampler
    is a per-GROUP array expression over a 301-element literal (no
    join, no shuffle beyond the count's own exchange).  Differential:
    tests/test_causal_differential.py re-derives the draw from
    math.exp + md5 + bisect independently."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u = (
        hash_int60(F.concat(F.lit("dgauss:"), F.col("event_type"))) % _DG_T
    ).alias("u")
    z = (
        F.size(
            F.filter(
                F.lit(_DG_CUMS), lambda c: c <= F.col("u")
            )
        )
        - _DG_B
    ).cast("long")
    return (
        base.withColumn("u", u)
        .select(
            "event_type",
            "n_true",
            z.alias("z_noise"),
            (F.col("n_true") + z).alias("noisy_count"),
            F.lit(_DG_SIGMA).alias("sigma"),
            F.lit(_DG_RHO).alias("rho_zcdp"),
            F.lit(_DG_EPS_1E6).alias("epsilon_at_delta_1e6"),
        )
        .orderBy("event_type")
    )


dq_dp_discrete_gaussian_counts.__doc__ = (
    dq_dp_discrete_gaussian_counts.__doc__.format(
        sigma=_DG_SIGMA, rho=_DG_RHO, eps=_DG_EPS_1E6, b=_DG_B
    )
)


# ------------------- DP budget ledger (over the whole family)

@register(
    "dq_dp_budget_ledger",
    tags=("dq", "privacy", "differential-privacy", "governance", "ledger"),
    oracle=f"""
WITH types AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types FROM events
),
days AS (
  SELECT CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                        MAX(CAST(ts AS DATE))) + 1 AS BIGINT) AS n_days
  FROM events
),
ledger AS (
  SELECT 1 AS release_order, 'dq_dp_noisy_counts' AS release,
         'count' AS statistic, CAST(1 AS BIGINT) AS l1_sensitivity,
         (SELECT n_types FROM types) AS n_cells,
         {_DP_EPS}e0 AS epsilon
  UNION ALL
  SELECT 2, 'dq_dp_clamped_sum', 'clamped_sum',
         CAST({_DP_SUM_CLAMP} AS BIGINT),
         (SELECT n_types FROM types), {_DP_EPS}e0
  UNION ALL
  SELECT 3, 'dq_dp_daily_histogram', 'histogram', CAST(1 AS BIGINT),
         (SELECT n_types FROM types) * (SELECT n_days FROM days),
         {_DP_HIST_EPS}e0
  UNION ALL
  SELECT 4, 'dq_dp_exponential_median', 'median_expmech',
         CAST(1 AS BIGINT), (SELECT n_types FROM types), {_DP_EPS}e0
  UNION ALL
  SELECT 5, 'dq_dp_user_level_sum', 'user_clamped_sum',
         CAST({_DP_USER_CLAMP} AS BIGINT),
         (SELECT n_types FROM types), {_DP_EPS}e0
  UNION ALL
  SELECT 6, 'dq_dp_discrete_gaussian_counts', 'gaussian_count',
         CAST(1 AS BIGINT), (SELECT n_types FROM types), {_DG_EPS_1E6}e0
)
SELECT release_order, release, statistic, l1_sensitivity, n_cells,
       epsilon,
       SUM(epsilon) OVER (ORDER BY release_order) AS eps_cumulative
FROM ledger ORDER BY release_order
""",
)
def dq_dp_budget_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRIVACY-BUDGET LEDGER over the engine's DP release family —
    the governance artifact a privacy-budgeted warehouse maintains
    next to the releases themselves: one row per registered release
    against the ``events`` table (noisy counts, clamped sum, daily
    histogram, exponential-mechanism median, user-level clamped sum,
    discrete-Gaussian counts — the zCDP row carries its δ=1e-6 pure-ε
    conversion so Σε stays one comparable, conservative column),
    its mechanism/sensitivity literals, the DATA-derived number of
    released cells, and the SEQUENTIAL-composition running total Σε —
    the number the data-protection officer compares against the
    table's budget cap.  Within each release the per-type/per-cell
    draws compose in PARALLEL (disjoint partitions of the event
    space, see ``dq_dp_daily_histogram``), so each release
    contributes its per-release ε ONCE to the sequential total — the
    two composition rules this ledger makes explicit.  The user-level
    row conservatively joins the event-level total even though its
    privacy UNIT differs (person vs event): mixed-unit spends sum to
    an upper bound under the coarser unit.

    MAINTENANCE COUPLING: every ``dq_dp_*`` release registered against
    ``events`` must add its row here — the round-6 review caught this
    ledger understating the family after two releases shipped without
    rows; ``tests/test_causal_differential.py`` now asserts the ledger
    enumerates every registered ``dq_dp_`` query.

    Exactness: cell counts are exact integers from two one-row aggs;
    the ε literals are exactly-representable doubles (0.5) so the
    running sum is exact binary arithmetic in both engines.

    Scale shape: two one-row aggregates over events (map-side
    partials) broadcast into a literal relation of one row per
    release; the window runs over those few rows."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    types = ev.agg(
        F.countDistinct("event_type").cast("bigint").alias("n_types")
    )
    days = ev.agg(
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            + 1
        )
        .cast("bigint")
        .alias("n_days")
    )
    rows = literal_df(
        spark,
        [
            (1, "dq_dp_noisy_counts", "count", 1, "types", _DP_EPS),
            (
                2,
                "dq_dp_clamped_sum",
                "clamped_sum",
                _DP_SUM_CLAMP,
                "types",
                _DP_EPS,
            ),
            (
                3,
                "dq_dp_daily_histogram",
                "histogram",
                1,
                "grid",
                _DP_HIST_EPS,
            ),
            (
                4,
                "dq_dp_exponential_median",
                "median_expmech",
                1,
                "types",
                _DP_EPS,
            ),
            (
                5,
                "dq_dp_user_level_sum",
                "user_clamped_sum",
                _DP_USER_CLAMP,
                "types",
                _DP_EPS,
            ),
            # the Gaussian release is ρ-zCDP; its row carries the
            # δ=1e-6 conversion so the sequential Σε stays a single
            # comparable (conservative) pure-ε column
            (
                6,
                "dq_dp_discrete_gaussian_counts",
                "gaussian_count",
                1,
                "types",
                _DG_EPS_1E6,
            ),
        ],
        "release_order int, release string, statistic string,"
        " l1_sensitivity long, cell_basis string, epsilon double",
    )
    w = Window.orderBy("release_order").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        rows.crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(days))
        .select(
            "release_order",
            "release",
            "statistic",
            "l1_sensitivity",
            F.when(F.col("cell_basis") == "types", F.col("n_types"))
            .otherwise(F.col("n_types") * F.col("n_days"))
            .cast("bigint")
            .alias("n_cells"),
            "epsilon",
        )
        .withColumn("eps_cumulative", F.sum("epsilon").over(w))
        .orderBy("release_order")
    )
