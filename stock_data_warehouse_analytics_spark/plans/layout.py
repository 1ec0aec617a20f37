"""Storage-layout effectiveness queries: Z-ORDER clustering vs the
ingest order, measured as min/max-zone data-skipping power.

The 100 TB context: engines prune parquet files (or row groups) with
per-file min/max column statistics.  A time-ordered ingest layout gives
perfect pruning on the time column and NONE on anything else; a Z-order
(Morton-curve) layout interleaves the bits of two clustering columns so
BOTH get useful min/max zones — the trade Delta's ``OPTIMIZE ZORDER BY``
and Iceberg's sort orders make.  This query computes the layout a
rewrite job WOULD produce and scores it: it is the decision table
("rewrite or not, on which columns") a table-maintenance service emits.

Everything is integer arithmetic (bit interleaving, BIGINT ``div``
bucketing, containment counts), so the whole audit is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.ranking import bucketed_global_rank, bucketed_global_rank_multi
from ..sources.tables import load_table
from .registry import register

_BITS = 10  # 10 bits per dimension → 20-bit z-value
_DIM = 1 << _BITS
_FILES = 64  # notional files a rewrite would emit
_PROBE_STEP = 64  # probe grid: x/y = 0, 64, …, 960 (16 point probes each)


def _z_col(x: Column, y: Column) -> Column:
    """Morton interleave: bit i of x → bit 2i, bit i of y → bit 2i+1."""
    z: Column = F.lit(0).cast("long")
    for i in range(_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _z_sql(x: str, y: str) -> str:
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


def _layout_sql(order_by: str, label: str) -> str:
    """One layout's summary row: rank → file → zone boxes → probe hits."""
    return f"""
  SELECT '{label}' AS layout,
         COUNT(*) AS n_files,
         CAST(SUM(max_x - min_x) AS BIGINT) AS sum_x_span,
         CAST(SUM(max_y - min_y) AS BIGINT) AS sum_y_span,
         CAST(SUM((SELECT COUNT(*) FROM probes p
                   WHERE p.v BETWEEN min_x AND max_x)) AS BIGINT)
           AS files_hit_x,
         CAST(SUM((SELECT COUNT(*) FROM probes p
                   WHERE p.v BETWEEN min_y AND max_y)) AS BIGINT)
           AS files_hit_y
  FROM (
    SELECT ((rk - 1) * {_FILES}) // n AS f,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM (SELECT x, y,
                 ROW_NUMBER() OVER (ORDER BY {order_by}, o_orderkey) AS rk,
                 COUNT(*) OVER () AS n
          FROM zed)
    GROUP BY f
  )
"""


@register(
    "layout_zorder_skipping",
    tags=("warehouse", "layout", "zorder", "data-skipping", "scale"),
    oracle=f"""
WITH s AS (
  SELECT MAX(o_custkey) AS max_ck, MIN(o_orderdate) AS d0,
         date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) + 1 AS nd
  FROM orders
),
zed AS (
  SELECT o_orderkey, x, y, {_z_sql("x", "y")} AS z
  FROM (
    SELECT o_orderkey,
           (o_custkey * {_DIM}) // (s.max_ck + 1) AS x,
           (date_diff('day', s.d0, o_orderdate) * {_DIM}) // s.nd AS y
    FROM orders CROSS JOIN s
  )
),
probes AS (
  SELECT unnest(generate_series(0, {_DIM - _PROBE_STEP}, {_PROBE_STEP}))
         AS v
)
{_layout_sql("y", "time")}
UNION ALL
{_layout_sql("z", "zorder")}
ORDER BY layout
""",
)
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout audit — would rewriting the orders table on a
    Morton curve over (customer, order-date) beat the time-ordered
    ingest layout for data skipping?  Both candidate layouts are
    simulated: rows ranked in layout order, packed into {files} notional
    files, and each file's min/max zone box measured; the score is (a)
    the summed per-file span of each dimension (tight spans ⇒ prunable
    statistics) and (b) how many files a 16-point probe grid on each
    dimension would actually touch.  Time layout: perfect on date,
    useless on customer (every probe hits every file).  Z-order: ~√
    on both — the table-maintenance decision row.

    Scale shape: dimensions are normalized into {bits}-bit integer grids
    with BIGINT ``div`` against a ONE-ROW scalar (max key / date span —
    broadcast); the Morton value is pure bit arithmetic; layout ranking
    uses ``bucketed_global_rank`` (n-way partitioned sort, two bounded
    driver round-trips, never a single-partition global sort); zone
    boxes are one grouped agg per layout over {files} files, and probe
    scoring joins the {files}-row box table to a 16-row broadcast probe
    spine.  Every number is an integer — bit-exact vs the oracle."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    s = o.agg(
        F.max("o_custkey").alias("max_ck"),
        F.min("o_orderdate").alias("d0"),
        (F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) + 1).alias(
            "nd"
        ),
    )
    zed = (
        o.crossJoin(F.broadcast(s))
        .select(
            "o_orderkey",
            F.expr(f"(o_custkey * {_DIM}) div (max_ck + 1)").alias("x"),
            F.expr(
                f"(datediff(o_orderdate, d0) * {_DIM}) div nd"
            ).alias("y"),
        )
        .withColumn("z", _z_col(F.col("x"), F.col("y")))
        .localCheckpoint(eager=False)  # consumed by two layout rankings
    )
    probes = spark.range(0, _DIM, _PROBE_STEP).select(
        F.col("id").cast("long").alias("v")
    )

    # r10: BOTH layout rankings share one sketch action and one counts
    # action (bucketed_global_rank_multi) instead of two independent
    # bucketed_global_rank calls — 4 driver actions → 2 over the same
    # zed table; ranks are exact under any cuts, so the fused sketch
    # job cannot change results (measured 3.1 → ~2.2 s steady).
    ranked_map, n = bucketed_global_rank_multi(
        zed,
        {"time": ["y", "o_orderkey"], "zorder": ["z", "o_orderkey"]},
        rank_col="rk",
    )

    def layout_row(lead: str, label: str) -> DataFrame:
        ranked = ranked_map[label]
        boxes = (
            ranked.select(
                F.expr(f"((rk - 1) * {_FILES}) div {n}").alias("f"), "x", "y"
            )
            .groupBy("f")
            .agg(
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
            )
        )
        boxes = boxes.localCheckpoint(eager=False)  # spans + hits passes
        spans = boxes.agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.col("max_x") - F.col("min_x")).alias("sum_x_span"),
            F.sum(F.col("max_y") - F.col("min_y")).alias("sum_y_span"),
        )
        hits = boxes.crossJoin(F.broadcast(probes)).agg(
            F.sum(
                F.col("v")
                .between(F.col("min_x"), F.col("max_x"))
                .cast("long")
            ).alias("files_hit_x"),
            F.sum(
                F.col("v")
                .between(F.col("min_y"), F.col("max_y"))
                .cast("long")
            ).alias("files_hit_y"),
        )
        return spans.crossJoin(hits).select(
            F.lit(label).alias("layout"),
            "n_files",
            "sum_x_span",
            "sum_y_span",
            "files_hit_x",
            "files_hit_y",
        )

    return (
        layout_row("y", "time")
        .unionByName(layout_row("z", "zorder"))
        .orderBy("layout")
    )


layout_zorder_skipping.__doc__ = layout_zorder_skipping.__doc__.format(
    files=_FILES, bits=_BITS
)


# ------------------------------------------- clustering depth (overlap)


@register(
    "layout_clustering_depth",
    tags=("warehouse", "layout", "clustering", "metrics"),
    oracle=f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rk,
         o_custkey,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS dkey
  FROM orders
),
files AS (
  SELECT ((rk - 1) * {_FILES}) // (SELECT n FROM n) AS f,
         CAST(MIN(o_custkey) AS BIGINT) AS min_c,
         CAST(MAX(o_custkey) AS BIGINT) AS max_c,
         CAST(MIN(dkey) AS BIGINT) AS min_d,
         CAST(MAX(dkey) AS BIGINT) AS max_d
  FROM ranked
  GROUP BY 1
),
ev AS (
  SELECT 'custkey' AS key, min_c AS k, 1 AS delta FROM files
  UNION ALL SELECT 'custkey', max_c + 1, -1 FROM files
  UNION ALL SELECT 'orderdate', min_d, 1 FROM files
  UNION ALL SELECT 'orderdate', max_d + 1, -1 FROM files
),
pts AS (
  SELECT key, k, CAST(SUM(delta) AS BIGINT) AS d
  FROM ev GROUP BY key, k
),
segs AS (
  SELECT key, k,
         CAST(SUM(d) OVER (PARTITION BY key ORDER BY k) AS BIGINT)
           AS depth,
         LEAD(k) OVER (PARTITION BY key ORDER BY k) - k AS seg_len
  FROM pts
)
SELECT key,
       CAST({_FILES} AS BIGINT) AS n_files,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       ROUND(CAST(SUM(CASE WHEN depth >= 1 THEN depth * seg_len END)
                  AS DOUBLE)
             / SUM(CASE WHEN depth >= 1 THEN seg_len END), 6)
         AS avg_depth,
       ROUND(CAST(SUM(CASE WHEN depth > 1 THEN seg_len END) AS DOUBLE)
             / SUM(CASE WHEN depth >= 1 THEN seg_len END), 6)
         AS frac_overlapped
FROM segs
WHERE seg_len IS NOT NULL
GROUP BY key
ORDER BY key
""",
)
def layout_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING-DEPTH (file-overlap) audit — the table-maintenance
    metric Iceberg/Delta compaction planners read: simulate the orders
    table as {files} ingest-ordered files, take each file's (min, max)
    range of a candidate clustering key, and sweep the key domain to
    measure how many file ranges OVERLAP at each point.  max_depth /
    avg_depth say how many files a point query on that key must read
    (depth 1 = perfectly clustered); frac_overlapped is the share of
    the covered key domain where ANY two files overlap — the signal
    that triggers a rewrite.  Ingest order is date-correlated, so the
    orderdate key audits near depth-1 while custkey audits near
    depth-{files} — the two poles of the decision.

    Exactness: the sweep is the classic +1/−1 endpoint trick (end
    events at max+1 keep integer half-open segments), depth is an
    integer running sum over per-key distinct endpoints, segment
    lengths are integer LEADs; the only doubles are the two final
    weighted-average divisions (round-6).

    Scale shape: file ranking reuses ``bucketed_global_rank`` (n-way
    partitioned sort, no single-partition pass over facts); everything
    after the per-file min/max aggregate operates on ≤ 4·{files}
    endpoint rows — the sweep windows run on a bounded frame (written
    bound in tests/test_plan_shapes._BOUNDED_SINGLE_PARTITION)."""
    from ..operators.ranking import bucketed_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("dkey"),
    )
    ranked, n = bucketed_global_rank(o, ["o_orderkey"], rank_col="rk")
    files = (
        ranked.select(
            F.expr(f"((rk - 1) * {_FILES}) div {n}").alias("f"),
            "o_custkey",
            "dkey",
        )
        .groupBy("f")
        .agg(
            F.min("o_custkey").cast("long").alias("min_c"),
            F.max("o_custkey").cast("long").alias("max_c"),
            F.min("dkey").cast("long").alias("min_d"),
            F.max("dkey").cast("long").alias("max_d"),
        )
        .localCheckpoint(eager=False)  # four endpoint projections
    )
    ev = (
        files.select(
            F.lit("custkey").alias("key"),
            F.col("min_c").alias("k"),
            F.lit(1).alias("delta"),
        )
        .unionByName(
            files.select(
                F.lit("custkey").alias("key"),
                (F.col("max_c") + 1).alias("k"),
                F.lit(-1).alias("delta"),
            )
        )
        .unionByName(
            files.select(
                F.lit("orderdate").alias("key"),
                F.col("min_d").alias("k"),
                F.lit(1).alias("delta"),
            )
        )
        .unionByName(
            files.select(
                F.lit("orderdate").alias("key"),
                (F.col("max_d") + 1).alias("k"),
                F.lit(-1).alias("delta"),
            )
        )
    )
    pts = ev.groupBy("key", "k").agg(
        F.sum("delta").cast("long").alias("d")
    )
    w = Window.partitionBy("key").orderBy("k")
    segs = pts.select(
        "key",
        "k",
        F.sum("d").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("depth"),
        (F.lead("k").over(w) - F.col("k")).alias("seg_len"),
    ).filter(F.col("seg_len").isNotNull())
    covered = F.sum(
        F.when(F.col("depth") >= 1, F.col("seg_len"))
    ).cast("double")
    return (
        segs.groupBy("key")
        .agg(
            F.lit(_FILES).cast("long").alias("n_files"),
            F.max("depth").cast("long").alias("max_depth"),
            F.round(
                F.sum(
                    F.when(
                        F.col("depth") >= 1,
                        F.col("depth") * F.col("seg_len"),
                    )
                ).cast("double")
                / covered,
                6,
            ).alias("avg_depth"),
            F.round(
                F.sum(F.when(F.col("depth") > 1, F.col("seg_len")))
                .cast("double")
                / covered,
                6,
            ).alias("frac_overlapped"),
        )
        .orderBy("key")
    )


layout_clustering_depth.__doc__ = layout_clustering_depth.__doc__.format(
    files=_FILES
)


# ------------------------------------------- compaction bin packing

_CP_BINS = 24  # target output file count for the simulated rewrite


@register(
    "layout_compaction_plan",
    tags=("warehouse", "layout", "compaction", "planning"),
    oracle=f"""
WITH files AS (
  SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MIN(o_custkey) AS BIGINT) AS min_c,
         CAST(MAX(o_custkey) AS BIGINT) AS max_c
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM files),
packed AS (
  SELECT d, n_rows, min_c, max_c,
         (SUM(n_rows) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_rows)
           // ((total + {_CP_BINS} - 1) // {_CP_BINS}) AS bin
  FROM files CROSS JOIN tot
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       MIN(d) AS first_day, MAX(d) AS last_day,
       CAST(MIN(min_c) AS BIGINT) AS min_custkey,
       CAST(MAX(max_c) AS BIGINT) AS max_custkey
FROM packed
GROUP BY bin
ORDER BY bin
""",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION (OPTIMIZE) PLAN — the bin-packing step a Delta/
    Iceberg table service runs after ``layout_clustering_depth`` says
    rewrite: simulate the orders table as one ingest file per order
    DAY (the streaming-ingest small-file regime; sizes vary with daily
    volume), then pack files in ingest order into target-size output
    bins — running-sum next-fit, target = ceil(total/{bins}) rows —
    emitting per output file its input-file count, row count, day span
    and resulting custkey zone.  The plan a rewrite job executes;
    read the bin count and per-bin n_files to see the small-file
    consolidation factor.

    Exactness: all integer — counts, a BIGINT running sum, integer
    ceil-division for the target, integer floor-division for the bin
    id; no doubles anywhere.

    Scale shape: the fact scan collapses to DAY grain map-side (one
    aggregate); the running-sum window is unpartitioned but runs on
    the CALENDAR-bounded day-grain frame (written bound in
    tests/test_plan_shapes._BOUNDED_SINGLE_PARTITION); a real
    multi-partition deployment runs this per table partition, which is
    exactly the per-key form of the same plan."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("o_custkey").cast("long").alias("min_c"),
        F.max("o_custkey").cast("long").alias("max_c"),
    )
    tot = files.agg(F.sum("n_rows").cast("long").alias("total"))
    packed = (
        files.crossJoin(F.broadcast(tot))
        .withColumn(
            "bin",
            F.expr(
                f"(sum(n_rows) over (order by d rows between unbounded"
                f" preceding and current row) - n_rows)"
                f" div ((total + {_CP_BINS} - 1) div {_CP_BINS})"
            ),
        )
    )
    return (
        packed.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("d").alias("first_day"),
            F.max("d").alias("last_day"),
            F.min("min_c").cast("long").alias("min_custkey"),
            F.max("max_c").cast("long").alias("max_custkey"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_files",
            "n_rows",
            "first_day",
            "last_day",
            "min_custkey",
            "max_custkey",
        )
        .orderBy("bin")
    )


layout_compaction_plan.__doc__ = layout_compaction_plan.__doc__.format(
    bins=_CP_BINS
)


_CPP_BINS = 4  # target output files per table partition (month)


@register(
    "layout_compaction_plan_partitioned",
    tags=("warehouse", "layout", "compaction", "planning", "partitioned"),
    oracle=f"""
WITH files AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) * 12
           + EXTRACT(MONTH FROM o_orderdate) - 1 AS mi,
         o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT mi, CAST(SUM(n_rows) AS BIGINT) AS m_total
  FROM files GROUP BY mi
),
packed AS (
  SELECT f.mi, f.d, f.n_rows,
         (SUM(f.n_rows) OVER (PARTITION BY f.mi ORDER BY f.d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - f.n_rows)
           // ((m_total + {_CPP_BINS} - 1) // {_CPP_BINS}) AS bin
  FROM files f JOIN tot USING (mi)
)
SELECT MAKE_DATE(CAST(mi // 12 AS INTEGER), CAST(mi % 12 + 1 AS INTEGER), 1)
         AS month,
       CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       MIN(d) AS first_day, MAX(d) AS last_day
FROM packed
GROUP BY mi, bin
ORDER BY month, bin
""",
)
def layout_compaction_plan_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-PARTITION compaction plan — ``layout_compaction_plan`` in
    the form a real table service runs it: partitioned tables compact
    WITHIN each partition (here: order month), so the next-fit running
    sum is a month-PARTITIONED window and the whole plan parallelizes
    across partitions with no global pass at all — the scale form of
    the single-table variant, whose one documented single-partition
    stage this shape avoids entirely.  Target =
    ceil(month_total/{bins}) rows per output file, per month.

    Exactness: all integer, as the single-table form — counts, BIGINT
    running sums, integer ceil/floor division, the integer month
    counter year·12+month−1 rendered to a first-of-month date.

    Scale shape: fact scan collapses to (month, day) grain map-side;
    every window and aggregate is partitioned by month; output is
    (months × ≤{bins}+1) rows."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    files = o.groupBy(
        (F.year(d) * 12 + F.month(d) - 1).cast("long").alias("mi"),
        d.alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    tot = files.groupBy("mi").agg(
        F.sum("n_rows").cast("long").alias("m_total")
    )
    packed = files.join(tot, "mi").withColumn(
        "bin",
        F.expr(
            f"(sum(n_rows) over (partition by mi order by d rows between"
            f" unbounded preceding and current row) - n_rows)"
            f" div ((m_total + {_CPP_BINS} - 1) div {_CPP_BINS})"
        ),
    )
    return (
        packed.groupBy("mi", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("d").alias("first_day"),
            F.max("d").alias("last_day"),
        )
        .select(
            F.make_date(
                F.floor(F.col("mi") / 12).cast("int"),
                (F.col("mi") % 12 + 1).cast("int"),
                F.lit(1),
            ).alias("month"),
            F.col("bin").cast("long").alias("bin"),
            "n_files",
            "n_rows",
            "first_day",
            "last_day",
        )
        .orderBy("month", "bin")
    )


layout_compaction_plan_partitioned.__doc__ = (
    layout_compaction_plan_partitioned.__doc__.format(bins=_CPP_BINS)
)
