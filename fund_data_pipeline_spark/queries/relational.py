"""Relational query surface over the star schema (SURVEY §2.6-2.8 plus the
join/agg/window capability the harness exercises).

Determinism discipline shared by every query here:
- monetary/double aggregates go through explicit DECIMAL casts on both the
  Spark and DuckDB side (float summation order is engine-dependent; decimal
  addition is exact and order-independent);
- no final projection emits DECIMAL: exact decimal sums are cast to DOUBLE
  at the very end on BOTH engines (the exact decimal has far fewer
  significant digits than a double holds, so the conversion is the same
  correctly-rounded value bit-for-bit — and DOUBLE survives every result
  canonicalizer, while decimal trailing-zero rendering does not);
- averages are computed as exact decimal SUM cast to DOUBLE divided by
  COUNT (identical IEEE bits on both engines);
- every top-k ORDER BY carries a unique tiebreak key so the selected row
  SET is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .numeric import dec as _dec
from .numeric import split_integer_total, split_scaled_decimal
from .registry import register, table


# ---------------------------------------------------------------------------
# A: aggregation surface
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    headline=True,
    doc="TPC-H Q1 flavor: grouped 8-way aggregate over lineitem (A1/A2 writ large).",
    oracle="""
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS dp,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS dpd,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))) AS dpdt,
         SUM(CAST(l_discount AS DECIMAL(8,2))) AS dd,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(FLOOR(dq) AS DOUBLE) + CAST(dq - FLOOR(dq) AS DOUBLE) AS sum_qty,
       CAST(FLOOR(dp) AS DOUBLE) + CAST(dp - FLOOR(dp) AS DOUBLE) AS sum_base_price,
       CAST(FLOOR(dpd) AS DOUBLE) + CAST(dpd - FLOOR(dpd) AS DOUBLE) AS sum_disc_price,
       CAST(FLOOR(dpdt) AS DOUBLE) + CAST(dpdt - FLOOR(dpdt) AS DOUBLE) AS sum_charge,
       (CAST(FLOOR(dq) AS DOUBLE) + CAST(dq - FLOOR(dq) AS DOUBLE)) / count_order AS avg_qty,
       (CAST(FLOOR(dd) AS DOUBLE) + CAST(dd - FLOOR(dd) AS DOUBLE)) / count_order AS avg_disc,
       count_order
FROM s
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact arithmetic WITHOUT per-row BigDecimal cost: every money value is
    # an exact integer in micro-units (price/qty/disc/tax are <=2dp, so
    # round(x*100) is exact and products carry scale 1e4/1e6), partial sums
    # run as LONG inside each scan partition (whole-stage-codegen integer
    # adds — measured 1.4x faster than decimal(18,2) sums at sf0.1), and the
    # per-partition partials merge in DECIMAL(38,0), which cannot overflow.
    # A partition would need >~1.8e8 rows of max-charge lineitems to
    # overflow its long partial (128 MB scan partitions hold ~1e6), and
    # ANSI mode (Spark 4 default) throws rather than wraps if one ever
    # does. The exact integer totals convert to DOUBLE floor-split (the
    # price_quantity_stats pattern): integer part via integral division
    # (long->double, correctly rounded at any magnitude), remainder as one
    # exact division of sub-scale integers. The oracle mirrors it as
    # FLOOR(s)/frac on its decimal sums — both halves are correctly
    # rounded in both engines (verified exhaustively over all fraction
    # numerators at scales 2/4/6 and at >2^53 integer parts), so the
    # recombining IEEE add yields identical bits regardless of scale
    # factor. A direct decimal->double cast followed by a double divide
    # would be two roundings and only magnitude-coincidentally equal.
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2001-06-30").cast("timestamp"))
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    dmul = F.lit(100) - disc_c
    tmul = F.lit(100) + F.round(F.col("l_tax") * 100).cast("long")
    part = li.groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("__pid")).agg(
        F.sum(qc).alias("q"),
        F.sum(pc).alias("p"),
        F.sum(pc * dmul).alias("pd"),
        F.sum(pc * dmul * tmul).alias("pdt"),
        F.sum(disc_c).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )

    def total(c):
        return F.sum(F.col(c).cast("decimal(38,0)"))

    tot = part.groupBy("l_returnflag", "l_linestatus").agg(
        total("q").alias("tq"),
        total("p").alias("tp"),
        total("pd").alias("tpd"),
        total("pdt").alias("tpdt"),
        total("d").alias("td"),
        F.sum("n").alias("count_order"),
    )

    def split(c, scale):
        # exact integer total -> double, floor-split (see doc above;
        # shared kernel in queries/numeric.py)
        return split_integer_total(F.col(c), scale)

    return tot.select(
        "l_returnflag",
        "l_linestatus",
        split("tq", 100).alias("sum_qty"),
        split("tp", 100).alias("sum_base_price"),
        split("tpd", 10000).alias("sum_disc_price"),
        split("tpdt", 1000000).alias("sum_charge"),
        (split("tq", 100) / F.col("count_order")).alias("avg_qty"),
        (split("td", 100) / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@register(
    "group_count_breakdown",
    doc="A1: value_counts() as groupBy().count() (00_performance_data_cleaner.py:143).",
    oracle="SELECT c_mktsegment AS segment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment",
)
def group_count_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "distinct_counts",
    doc="A: exact distinct counts per group (count_distinct surface).",
    oracle="""
SELECT o_orderpriority AS priority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "order_price_percentiles",
    doc="A: exact rank-based percentiles (percentile_disc) of order value "
    "per priority. Discrete percentiles return actual data elements — no "
    "float interpolation — so both engines emit identical bits.",
    oracle="""
SELECT o_orderpriority AS priority,
       quantile_disc(o_totalprice, 0.50) AS p50,
       quantile_disc(o_totalprice, 0.90) AS p90,
       quantile_disc(o_totalprice, 0.99) AS p99,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50"),
            F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY o_totalprice)").alias("p90"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)").alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "rollup_revenue",
    doc="A: hierarchical subtotals via ROLLUP with grouping_id disambiguation.",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "revenue", "n")
    )


@register(
    "cube_order_stats",
    doc="A: CUBE over two dimensions.",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@register(
    "pivot_status_by_segment",
    doc="A: pivot (segment x orderstatus counts).",
    oracle="""
SELECT c_mktsegment AS segment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # no broadcast hint: customer grows with SF (~15M rows at sf100); AQE
    # broadcasts when the filtered build side is actually small (review r9)
    cust = table(spark, sf_dir, "customer")
    pivoted = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .withColumnsRenamed({"O": "status_o", "F": "status_f", "P": "status_p"})
    )
    # an empty (segment, status) pivot cell is NULL in Spark but 0 under the
    # oracle's COUNT(*) FILTER — coalesce so a sparse fixture can't diverge
    return pivoted.select(
        "segment",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
            for c in ("status_o", "status_f", "status_p")
        ],
    )


# ---------------------------------------------------------------------------
# joins (SURVEY §2.6 — the rebuild ships the full join surface)
# ---------------------------------------------------------------------------

@register(
    "top_unshipped_orders",
    headline=True,
    doc="TPC-H Q3 flavor: 3-way join + group + deterministic top-10.",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # no broadcast hint: the segment-filtered customer table GROWS
        # with SF (~3M rows at sf100); AQE broadcasts it at runtime while
        # it is actually small (review r10 — same rule the other customer
        # joins adopted in r9)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "regional_supplier_volume",
    headline=True,
    doc="TPC-H Q5 flavor: 6-way join through region/nation, co-located cust/supp nation.",
    oracle="""
SELECT n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
""",
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    # supplier gets NO broadcast hint: at sf100 it is ~1M rows and a forced
    # broadcast would be a scale hazard — AQE still broadcasts it when it is
    # genuinely under the threshold. nation/region are bounded dims (25/5
    # rows at every SF), so their hints are safe forever.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "customers_without_orders",
    doc="U2/G1/S10: anti-join gap detection (master minus delivered). The "
    "done-set is orders since 1998 so the gap set is non-trivial at every SF "
    "(every fixture customer has SOME order; many have none recently).",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    from ..sources.registry import resume_anti_join

    return resume_anti_join(
        cust, recent.withColumnRenamed("o_custkey", "c_custkey"), ["c_custkey"]
    ).select("c_custkey", "c_name")


@register(
    "active_customers_semi",
    doc="S8-style membership lookup as a left-semi join.",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
""",
)
def active_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    open_orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(
        open_orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "order_fulfillment_outer",
    doc="Full-outer join with null-side indicators (MERGE's underlying shape).",
    oracle="""
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       (c.c_custkey IS NOT NULL) AS in_customer,
       (o.n_orders IS NOT NULL) AS has_orders,
       COALESCE(o.n_orders, 0) AS n_orders
FROM customer c
FULL OUTER JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""",
)
def order_fulfillment_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").alias("c")
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .alias("o")
    )
    return cust.join(per_cust, F.col("c.c_custkey") == F.col("o.o_custkey"), "full_outer").select(
        F.coalesce(F.col("c.c_custkey"), F.col("o.o_custkey")).alias("custkey"),
        F.col("c.c_custkey").isNotNull().alias("in_customer"),
        F.col("o.n_orders").isNotNull().alias("has_orders"),
        F.coalesce(F.col("o.n_orders"), F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# set operations (U1 + harness INTERSECT/EXCEPT)
# ---------------------------------------------------------------------------

@register(
    "repeat_buyers_intersect",
    doc="INTERSECT: customers ordering in both 1996 and 2000.",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 2000
""",
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    y00 = orders.filter(F.year("o_orderdate") == 2000).select(F.col("o_custkey").alias("custkey"))
    return y96.intersect(y00)


@register(
    "churned_buyers_except",
    doc="EXCEPT: customers ordering in 1996 but never in 2000-2001.",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 2000
""",
)
def churned_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    later = orders.filter(F.year("o_orderdate") >= 2000).select(F.col("o_custkey").alias("custkey"))
    return y96.subtract(later)  # EXCEPT (distinct) semantics


@register(
    "buyer_set_ops",
    doc="INTERSECT and EXCEPT exercised in one relation: 1996 buyers split "
    "into the 'retained' cohort (also bought in 2000+) and the 'churned' "
    "cohort (never again) — one driver-checked row covering both set ops.",
    oracle="""
SELECT 'retained' AS cohort, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 2000
)
UNION ALL
SELECT 'churned' AS cohort, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
  EXCEPT
  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 2000
)
""",
)
def buyer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    later = orders.filter(F.year("o_orderdate") >= 2000).select(F.col("o_custkey").alias("custkey"))
    retained = y96.intersect(later).select(F.lit("retained").alias("cohort"), "custkey")
    churned = y96.subtract(later).select(F.lit("churned").alias("cohort"), "custkey")
    return retained.unionByName(churned)


# ---------------------------------------------------------------------------
# windows / ordered analytics (SURVEY §2.8)
# ---------------------------------------------------------------------------

@register(
    "top_orders_per_customer",
    doc="W: top-3 orders per customer by price — rank/row_number with unique tiebreak.",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         o_totalprice AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rn <= 3
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "running_revenue_by_supplier",
    doc="W: running decimal sum + lag/lead over an ordered per-supplier frame.",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev,
       LAG(l_orderkey)  OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_order,
       LEAD(l_orderkey) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS next_order
FROM lineitem
WHERE l_suppkey < 10
""",
)
def running_revenue_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 10)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(_dec("l_extendedprice")).over(frame).cast("double").alias("running_rev"),
            F.lag("l_orderkey").over(w).alias("prev_order"),
            F.lead("l_orderkey").over(w).alias("next_order"),
        )
    )


@register(
    "latest_order_per_customer",
    doc="A3/W5: latest-per-key reduction (max_by flavor, deterministic tiebreak).",
    oracle="""
SELECT o_custkey, o_orderkey AS latest_orderkey,
       CAST(o_orderdate AS DATE) AS latest_orderdate,
       o_totalprice AS latest_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup import dedup_keyed

    latest = dedup_keyed(
        table(spark, sf_dir, "orders"),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        keep="last",
    )
    return latest.select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").cast("date").alias("latest_orderdate"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


@register(
    "ntile_quartiles",
    doc="W: ntile bucketing of customers by balance within segment (unique tiebreak; "
    "partitioned window so no single-reducer global sort at scale).",
    oracle="""
SELECT c_custkey,
       c_acctbal AS acctbal,
       NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
""",
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Multi-join analytics (TPC-H Q7/Q14/Q15 flavors)
# ---------------------------------------------------------------------------

@register(
    "nation_pair_revenue",
    doc="TPC-H Q7 flavor: revenue between customer-nation and supplier-nation "
    "pairs by year. Two broadcast dim joins (nation twice under different "
    "aliases), fact-fact join on orderkey, then a 3-key aggregate.",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name < sn.n_name
GROUP BY 1, 2, 3
""",
)
def nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    # customer/supplier: no hard broadcast hint (15M / 1M rows at sf100 —
    # forced broadcast is a scale hazard; AQE broadcasts when truly small).
    # nation (25 rows at every SF) keeps the hint.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), orders.o_custkey == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "promo_revenue_share",
    doc="TPC-H Q14 flavor: conditional-aggregate ratio (share of revenue from "
    "PROMO parts in one month). Part side broadcast; ratio computed from two "
    "exact decimal sums so both engines emit identical bits.",
    oracle="""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
     AS DOUBLE) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        # no broadcast hint: part grows with SF (~20M rows at sf100) —
        # forcing it through the driver is the exact scale hazard the
        # nation_pair fix documented; AQE broadcasts when truly small
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(revenue).cast("double"))
            .cast("double")
            .alias("promo_share_pct")
        )
    )


@register(
    "top_supplier_revenue",
    doc="TPC-H Q15 flavor: supplier(s) achieving the maximum quarterly "
    "revenue — aggregate, then compare to the global max as a broadcast "
    "ONE-ROW aggregate over the per-supplier relation (r11: previously an "
    "unpartitioned window, which serializes every supplier through a "
    "single task; the rev relation is |suppliers|-sized — small at test "
    "SFs but worth millions of rows at warehouse scale). The max-compare "
    "stays exact decimal; only the final projection casts.",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(revenue).alias("total_revenue")
    )
    best = rev.crossJoin(
        F.broadcast(rev.agg(F.max("total_revenue").alias("max_rev")))
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return best.join(supp, best.suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
    )


_PROFILE_COLS = ("c_custkey", "c_nationkey", "c_name", "c_mktsegment")


@register(
    "table_profile",
    doc="One-pass data-quality profile of customer: per-column null count, "
    "exact distinct count, native-order min/max with the RESULT cast to "
    "string (non-float columns only, so both engines render identically). "
    "Spark computes ALL columns' stats in a single aggregate pass over the "
    "table, then unpivots — the ANALYZE-style profiling an ingest pipeline "
    "runs per batch.",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM customer"""
        for c in _PROFILE_COLS
    ),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "customer")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            # aggregate in the native type, cast the result: MIN(bigint) is
            # numeric order; min of the string cast would be lexicographic
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


@register(
    "key_skew_profile",
    doc="Heavy-hitter diagnosis before a big join/agg: the top-10 join-key "
    "values by row count with their share of the table — the operational "
    "check that decides between a plain join, salting, and AQE skew "
    "handling. One hash aggregate + a 1-row broadcast of the total + "
    "TakeOrderedAndProject; at 100 TB this costs one scan.",
    oracle="""
WITH c AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders
)
SELECT key, n, CAST(n AS DOUBLE) / total AS share
FROM c, t
ORDER BY n DESC, key
LIMIT 10
""",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = orders.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("key", "n", (F.col("n").cast("double") / F.col("total")).alias("share"))
        .orderBy(F.col("n").desc(), "key")
        .limit(10)
    )


@register(
    "price_histogram",
    doc="Fixed-width histogram of order totals (width 25000, literal "
    "bounds): floor-bucket on an exact DECIMAL cast so both engines bin "
    "identically, one hash aggregate with map-side combine — the "
    "distribution-profile op behind data-drift dashboards.",
    oracle="""
SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 25000) AS BIGINT) AS bucket,
       CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 25000) AS BIGINT) * 25000 AS bucket_lo,
       COUNT(*) AS n_orders,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders
GROUP BY 1
""",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    bucket = F.floor(dec / 25000).cast("long")
    return (
        orders.select(dec.alias("p"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("p").cast("double").alias("min_price"),
            F.max("p").cast("double").alias("max_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 25000).alias("bucket_lo"),
            "n_orders",
            "min_price",
            "max_price",
        )
    )


@register(
    "price_quantity_stats",
    doc="Statistical aggregate surface: per-flag mean/stddev/correlation "
    "over lineitem, computed from exact DECIMAL power sums (Sx, Sxx, Sxy) "
    "converted to DOUBLE before the closed-form moment formulas — the "
    "float arithmetic then starts from bit-identical inputs on both "
    "engines, so stddev/corr are deterministic where the engines' native "
    "summation-order-dependent STDDEV/CORR aggregates are not. The "
    "conversion is floor-split (integer part and fraction cast "
    "separately, one IEEE add): a direct DECIMAL(p,s>0)->DOUBLE cast of a "
    ">2^53 sum is NOT correctly rounded in DuckDB (int128->double then "
    "*10^-s: two roundings, measured 1 ULP off Spark on Sxx), while "
    "scale-0 and sub-1 conversions are correctly rounded in both. One "
    "hash aggregate, map-side partials; formula cost is per-group.",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS dsx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS dsxx,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dsy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS dsyy,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS dsxy
  FROM lineitem GROUP BY l_returnflag
), d AS (
  SELECT l_returnflag, n,
         CAST(FLOOR(dsx) AS DOUBLE) + CAST(dsx - FLOOR(dsx) AS DOUBLE) AS sx,
         CAST(FLOOR(dsxx) AS DOUBLE) + CAST(dsxx - FLOOR(dsxx) AS DOUBLE) AS sxx,
         CAST(FLOOR(dsy) AS DOUBLE) + CAST(dsy - FLOOR(dsy) AS DOUBLE) AS sy,
         CAST(FLOOR(dsyy) AS DOUBLE) + CAST(dsyy - FLOOR(dsyy) AS DOUBLE) AS syy,
         CAST(FLOOR(dsxy) AS DOUBLE) + CAST(dsxy - FLOOR(dsxy) AS DOUBLE) AS sxy
  FROM s
)
SELECT l_returnflag, n,
       sx / n AS mean_price,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_price,
       (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_price_qty
FROM d
""",
)
def price_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price, qty = _dec("l_extendedprice"), _dec("l_quantity")

    # floor-split decimal->double (see doc; shared kernel in
    # queries/numeric.py)
    to_double = split_scaled_decimal

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        to_double(F.sum(price)).alias("sx"),
        to_double(F.sum(price * price)).alias("sxx"),
        to_double(F.sum(qty)).alias("sy"),
        to_double(F.sum(qty * qty)).alias("syy"),
        to_double(F.sum(price * qty)).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_price"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_price"),
        ((n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))).alias(
            "corr_price_qty"
        ),
    )


@register(
    "winsorized_price_stats",
    doc="Robust statistics via rank-based winsorization: per order "
    "priority, order prices are clipped at the group's p01/p99 values "
    "selected by RANK (value at row ceil(q*n) of the (price, key)-sorted "
    "group — pure integer rank selection, NO interpolated quantile "
    "arithmetic, so both engines pick the identical threshold row), then "
    "aggregated with exact DECIMAL sums. The ML-feature-prep outlier-clip "
    "shape: two window passes over one shuffle on the group key, "
    "thresholds join back broadcast (one row per group).",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), thresholds AS (
  SELECT o_orderpriority,
         MAX(CASE WHEN r = GREATEST(CAST(1 AS BIGINT), CAST(CEIL(n * 0.01) AS BIGINT)) THEN o_totalprice END) AS lo,
         MAX(CASE WHEN r = CAST(CEIL(n * 0.99) AS BIGINT) THEN o_totalprice END) AS hi
  FROM ranked GROUP BY o_orderpriority
)
SELECT r.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN r.o_totalprice < t.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(SUM(CASE WHEN r.o_totalprice > t.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       t.lo AS p01, t.hi AS p99,
       CAST(SUM(CAST(LEAST(GREATEST(r.o_totalprice, t.lo), t.hi) AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_sum
FROM ranked r JOIN thresholds t USING (o_orderpriority)
GROUP BY r.o_orderpriority, t.lo, t.hi
""",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo_r = F.greatest(F.lit(1).cast("bigint"), F.ceil(F.col("n") * 0.01).cast("bigint"))
    hi_r = F.ceil(F.col("n") * 0.99).cast("bigint")
    thresholds = ranked.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("r") == lo_r, F.col("o_totalprice"))).alias("lo"),
        F.max(F.when(F.col("r") == hi_r, F.col("o_totalprice"))).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        ranked.join(F.broadcast(thresholds), "o_orderpriority")
        .groupBy("o_orderpriority", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_hi"),
            F.sum(clipped.cast("decimal(18,2)")).cast("double").alias("winsorized_sum"),
        )
        .select(
            "o_orderpriority",
            "n_rows",
            "n_clipped_lo",
            "n_clipped_hi",
            F.col("lo").alias("p01"),
            F.col("hi").alias("p99"),
            "winsorized_sum",
        )
    )


@register(
    "fk_integrity_audit",
    doc="Referential-integrity audit across the star schema in one result: "
    "per FK relationship, the child row count, NULL-key count, and orphan "
    "count (left-anti join against the parent). The standing data-quality "
    "gate a warehouse runs after every load; each relationship is one "
    "broadcast-or-shuffle anti-join, unioned into a six-row report.",
    oracle="""
SELECT 'lineitem.l_orderkey->orders' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys,
       CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN l_partkey IS NOT NULL AND p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN l_suppkey IS NOT NULL AND s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN c_nationkey IS NOT NULL AND n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN s_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN s_nationkey IS NOT NULL AND n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
""",
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def audit(rel: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        joined = child.select(F.col(ckey)).join(
            parent.select(F.col(pkey)), F.col(ckey) == F.col(pkey), "left"
        )
        return joined.agg(
            F.lit(rel).alias("relationship"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(ckey).isNull(), 1).otherwise(0)).cast("bigint").alias("n_null_keys"),
            F.sum(
                F.when(F.col(ckey).isNotNull() & F.col(pkey).isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_orphans"),
        ).select("relationship", "n_rows", "n_null_keys", "n_orphans")

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    reports = [
        audit("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        audit("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
        audit("lineitem.l_suppkey->supplier", li, "l_suppkey", supplier, "s_suppkey"),
        audit("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey"),
        audit("customer.c_nationkey->nation", customer, "c_nationkey", nation, "n_nationkey"),
        audit("supplier.s_nationkey->nation", supplier, "s_nationkey", nation, "n_nationkey"),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


@register(
    "union_mixed_schemas",
    doc="U1 driver-checked: UNION ALL of heterogeneous frames via "
    "unionByName(allowMissingColumns=True) — the landing-zone append shape "
    "where files legitimately differ in width; the missing column "
    "null-fills instead of positional-union silently misaligning. Narrow "
    "map-side op; at scale this is a metadata-only plan node.",
    oracle="""
SELECT c_custkey AS entity_id, c_name AS name, c_mktsegment AS segment, 'customer' AS side
FROM customer
UNION ALL
SELECT s_suppkey, s_name, NULL, 'supplier'
FROM supplier
""",
)
def union_mixed_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("side"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("side"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)
