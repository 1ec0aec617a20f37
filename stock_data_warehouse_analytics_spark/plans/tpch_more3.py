"""Fifth TPC-H-shaped batch — the remaining canonical shapes:
correlated EXISTS (Q4), market share with conditional aggregation (Q8),
multiway profit rollup (Q9), returned-item top-k (Q10), HAVING against
a global scalar (Q11), view-max join-back (Q15), anti-join + count
distinct (Q16), and the double EXISTS / NOT EXISTS supplier-waiting
query (Q21).

The testdata schema lacks partsupp / l_receiptdate / l_commitdate, so
each query keeps its namesake's *plan shape* over what exists (noted
per query); "late" is defined against ``o_orderdate + INTERVAL`` since
there is no commit date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import dsum, sql_dsum
from .registry import register

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q4_priority_late_exists",
    tags=("join", "semi", "exists", "tpch"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late line, counted by
    priority.  The correlated EXISTS becomes a LEFT SEMI join whose
    condition mixes the equi-key with a cross-side inequality — Spark
    plans the equi part as the shuffle key and evaluates the date
    predicate as a join residual, so no cartesian appears.  (Reference
    has no EXISTS queries; shape mandated by SURVEY §2 joins.)"""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    tags=("join", "multiway", "conditional-agg", "tpch"),
    oracle=f"""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
       ROUND(
         {sql_dsum(f"CASE WHEN sn.n_name = 'NATION_3' THEN {_REV} ELSE 0.0 END")}
         / {sql_dsum(_REV)}, 6) AS mkt_share
FROM lineitem
JOIN orders    ON o_orderkey = l_orderkey
JOIN part      ON p_partkey = l_partkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN customer  ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region    ON r_regionkey = cn.n_regionkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a part-type's revenue into
    a region, per year — an 8-way star join where every dimension
    (part/supplier/nation/region) broadcasts and only orders⋈lineitem
    shuffles, then a conditional-sum / total-sum ratio per group (the
    CASE folds the supplier-nation predicate into the aggregate rather
    than a second scan)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(F.lit(0.0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(dsum(nation_rev) / dsum(_rev()), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    tags=("join", "multiway", "tpch"),
    oracle=f"""
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
       {sql_dsum('l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity')}
         AS sum_profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year over a
    part-name substring filter.  partsupp is absent from the testdata,
    so cost is modeled as ``0.5 * p_retailprice * l_quantity`` — the
    plan shape (fact ⋈ filtered part ⋈ supplier ⋈ nation, expression
    aggregate, two-key group) is Q9's.  The LIKE prunes part BEFORE the
    join so the broadcast side is already small."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q10_returned_item_customers",
    tags=("join", "topk", "tpch"),
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {sql_dsum(_REV)} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1998-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    half-year window — returnflag-filtered fact ⋈ date-filtered orders
    ⋈ customer ⋈ nation, grouped top-20 (TakeOrderedAndProject; only 20
    rows cross the final exchange).  Ties broken by custkey so the
    LIMIT is deterministic across engines."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q11_important_parts",
    tags=("agg", "having", "scalar-subquery", "tpch"),
    oracle=f"""
SELECT l_partkey, {sql_dsum(_REV)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {sql_dsum(_REV)} > (
  SELECT {sql_dsum(_REV)} * 0.002 FROM lineitem
)
ORDER BY part_value DESC, l_partkey
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a fraction of the
    GLOBAL total — grouped agg filtered against a scalar subquery.  The
    one-row total is crossJoin-broadcast to the grouped side (Spark's
    decorrelation of the scalar subquery), so the fact scans twice but
    never re-shuffles for the comparison."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    per_part = l.groupBy("l_partkey").agg(dsum(_rev()).alias("part_value"))
    total = l.agg((dsum(_rev()) * 0.002).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "q15_top_supplier",
    tags=("join", "argmax", "view", "tpch"),
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum(_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    AND l_shipdate <  TIMESTAMP '1999-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — a reused "view" (the per-supplier aggregate) consumed
    twice: once for the global max (one-row broadcast), once joined
    back to keep ALL tied suppliers (the row_number()=1 form would drop
    ties)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-04-01").cast("timestamp_ntz"))
    )
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev()).alias("total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue0.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    tags=("join", "anti", "count-distinct", "tpch"),
    oracle="""
SELECT p_brand,
       CASE WHEN p_size < 20 THEN 'small' ELSE 'large' END AS size_class,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
  )
GROUP BY p_brand, size_class
ORDER BY supplier_cnt DESC, p_brand, size_class
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per brand/size class,
    excluding one brand and a NOT IN supplier blacklist.  The NOT IN
    becomes a LEFT ANTI join against the (tiny, broadcast) blacklist —
    s_suppkey is never null here so anti-join and NOT IN agree; the
    count-distinct is the only shuffle that touches fact-sized data."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#1")
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000.0)
        .select("s_suppkey")
    )
    size_class = F.when(F.col("p_size") < 20, "small").otherwise("large")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", size_class.alias("size_class"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "size_class")
    )


@register(
    "q21_waiting_suppliers",
    tags=("join", "semi", "anti", "exists", "tpch"),
    oracle="""
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 75 DAY
), members AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
)
SELECT s_name, COUNT(*) AS numwait
FROM late t
JOIN supplier ON s_suppkey = t.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM members m
    WHERE m.l_orderkey = t.l_orderkey AND m.l_suppkey <> t.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM late x
    WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey <> t.l_suppkey
)
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier order.  "Late" is shipdate > orderdate + 75d (no
    commit/receipt dates in the testdata).  Both the EXISTS (another
    supplier participated) and NOT EXISTS (no OTHER supplier was late)
    are joins on the order key with a supplier-inequality residual:
    LEFT SEMI then LEFT ANTI — the classic double-correlated-subquery
    plan, with no cartesian and one distinct-pair shuffle feeding both
    sides."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    members = l.select("l_orderkey", "l_suppkey").distinct()
    m = members.select(
        F.col("l_orderkey").alias("m_orderkey"), F.col("l_suppkey").alias("m_suppkey")
    )
    x = late.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sole_late = (
        late.join(
            m,
            (F.col("l_orderkey") == F.col("m_orderkey"))
            & (F.col("l_suppkey") != F.col("m_suppkey")),
            "left_semi",
        ).join(
            x,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "q20_dominant_suppliers",
    tags=("join", "semi", "nested-agg", "tpch"),
    oracle=f"""
WITH blue AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'
), shipped AS (
  SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity')} AS qty_s
  FROM lineitem JOIN blue ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate <  TIMESTAMP '1999-01-01'
  GROUP BY l_partkey, l_suppkey
), totals AS (
  SELECT l_partkey AS tp, {sql_dsum('l_quantity')} AS qty_total
  FROM lineitem JOIN blue ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate <  TIMESTAMP '1999-01-01'
  GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM shipped
JOIN totals   ON l_partkey = tp AND qty_s > 0.3 * qty_total
JOIN supplier ON s_suppkey = l_suppkey
ORDER BY s_suppkey
""",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate (>30% of) a filtered
    part's yearly shipped volume — nested aggregation at two grain
    levels (part×supplier, then part) compared row-wise, then a
    DISTINCT semi-ish reduction onto supplier.  Both aggregates come
    off the SAME filtered scan and share the l_partkey shuffle key, so
    the per-part total reuses the partitioning of the finer grain
    (no partsupp in testdata; availqty is modeled by shipped volume,
    keeping Q20's plan shape)."""
    blue = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(dsum("l_quantity").alias("qty_s"))
    totals = l.groupBy(F.col("l_partkey").alias("tp")).agg(
        dsum("l_quantity").alias("qty_total")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        shipped.join(
            totals,
            (F.col("l_partkey") == F.col("tp"))
            & (F.col("qty_s") > 0.3 * F.col("qty_total")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )
