"""Advanced relational + temporal operators the reference lacks but a
complete engine needs: grouping sets, subqueries (EXISTS / scalar), lead-lag,
discrete quantiles, unpivot, skew-salted joins, as-of joins, and bucketed
range joins.

As-of and range joins are the two operators Spark has no native physical
strategy for (Databricks range-join hints aside); both are implemented here
as compositions of built-in ops that keep a single key-shuffle and avoid
any cross product:

- as-of  = union(left-marker, right) -> window LOCF per key  (one shuffle,
  state bounded by partition; the standard scalable pattern);
- range  = time-bucket both sides, equi-join on (key, bucket), then apply
  the range predicate (each right row joins at most once because its own
  bucket is unique; left side explodes to the fixed number of buckets a
  range can span — O(span/bucket) duplication, never O(n^2)).

Determinism: same decimal/tiebreak discipline as queries/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .numeric import dec as _dec
from .numeric import split_scaled_decimal as _split
from .registry import register, table


# ---------------------------------------------------------------------------
# grouping sets / subqueries
# ---------------------------------------------------------------------------

@register(
    "grouping_sets_revenue",
    doc="A: explicit GROUPING SETS ((flag,status),(flag),()) with grouping_id. "
    "The grand-total () set sums the WHOLE corpus, so the decimal->double "
    "conversion goes through the floor-split kernel (numeric.py) — a direct "
    "cast is 1 ULP off DuckDB beyond 2^53 scaled units (review r11; same "
    "trap pricing_summary fixed in r9).",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE)
         + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            _split(F.sum(_dec("l_extendedprice"))).alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "revenue")
    )


@register(
    "priority_orders_exists",
    doc="Correlated EXISTS subquery (TPC-H Q4 flavor) as a left-semi join: "
    "orders having at least one returned lineitem, counted per priority.",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def priority_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    returned = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "small_quantity_revenue",
    doc="Scalar aggregate subquery (TPC-H Q17 flavor): lineitems with quantity "
    "below half the part's average quantity. The threshold compare is kept "
    "exact (qty*2*cnt < sum as decimals) so no float-average boundary flaps.",
    oracle="""
SELECT CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE)
         + CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE) AS total_price,
       COUNT(*) AS n
FROM lineitem l
JOIN (SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey) g
  ON l.l_partkey = g.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 2 * g.cnt < g.qty_sum
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("qty_sum"),
        F.count(F.lit(1)).alias("cnt"),
    )
    l = li.alias("l")
    g = per_part.alias("g")
    return (
        l.join(g, F.col("l.l_partkey") == F.col("g.l_partkey"))
        .filter(_dec("l.l_quantity") * 2 * F.col("g.cnt") < F.col("g.qty_sum"))
        .agg(
            # corpus-wide sum: floor-split conversion (review r11)
            _split(F.sum(_dec("l.l_extendedprice"))).alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# ordered analytics
# ---------------------------------------------------------------------------

@register(
    "order_price_lead_lag",
    doc="W: lag/lead over per-customer order history with exact decimal delta.",
    oracle="""
SELECT o_orderkey, o_custkey,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) - CAST(lag(o_totalprice) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def order_price_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (_dec("o_totalprice") - prev.cast("decimal(18,2)")).cast("double").alias("delta"),
    )


@register(
    "price_quartiles_by_segment",
    doc="Discrete quantiles (quantile_disc semantics: value at ceil(q*n)) per "
    "market segment, computed via row_number so both engines pick the exact "
    "same stored double — no interpolation arithmetic to disagree on.",
    oracle="""
SELECT c_mktsegment AS segment,
       quantile_disc(o_totalprice, 0.25) AS q25,
       quantile_disc(o_totalprice, 0.50) AS q50,
       quantile_disc(o_totalprice, 0.75) AS q75
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def price_quartiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    seg = (
        # no broadcast hint: customer grows with SF; AQE decides (review r9)
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("price"))
    )
    w = Window.partitionBy("segment").orderBy("price")
    ranked = seg.select(
        "segment",
        "price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("segment")).alias("n"),
    )
    qcol = {}
    for q, name in ((0.25, "q25"), (0.50, "q50"), (0.75, "q75")):
        qcol[name] = F.max(F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("price")))
    return ranked.groupBy("segment").agg(*[c.alias(n) for n, c in qcol.items()])


# ---------------------------------------------------------------------------
# reshaping
# ---------------------------------------------------------------------------

@register(
    "unpivot_part_metrics",
    doc="Unpivot/melt wide part metrics to long (metric, value) rows.",
    oracle="""
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
""",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    return part.unpivot(["p_partkey"], ["p_size", "p_retailprice"], "metric", "value")


# ---------------------------------------------------------------------------
# skew handling
# ---------------------------------------------------------------------------

@register(
    "salted_join_revenue",
    doc="Skew-salted equi-join: lineitem keys are salted (deterministic "
    "pmod(xxhash64, 8)) and orders replicated across the 8 salt values, so a "
    "hot l_orderkey spreads over 8 tasks instead of one straggler. Result is "
    "identical to the plain join (the oracle runs the unsalted SQL).",
    oracle="""
SELECT o_orderstatus,
       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)))) AS DOUBLE)
         + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)))
                - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 8
    li = table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_linenumber", "l_partkey"), F.lit(n_salt)).cast("int")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    return (
        li.join(orders, ["salt"], "inner")
        .where(li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            # 3 status groups over the whole corpus: floor-split (review r11)
            _split(F.sum(revenue)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# as-of join (temporal point lookup)
# ---------------------------------------------------------------------------

@register(
    "asof_last_click_before_purchase",
    headline=True,
    doc="As-of join: for every purchase, the latest click at-or-before its "
    "timestamp for the same user (LEFT semantics: purchases with no prior "
    "click keep NULLs). Implemented as union + per-user window LOCF — one "
    "shuffle on user_id, no range blow-up; the scalable as-of pattern. "
    "Ties (several clicks at the as-of instant) resolve to the greatest "
    "click event_id on BOTH engines — an ASOF JOIN oracle would pick an "
    "arbitrary tie survivor, so the oracle is the explicit ranked form "
    "(review r9).",
    oracle="""
WITH j AS (
  SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, c.value AS click_value,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts)
SELECT event_id, user_id, ts, click_ts, click_value FROM j WHERE rn = 1
""",
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # the click's (ts, value) travel as ONE struct: two independent
    # F.last(ignorenulls) calls could take ts and value from DIFFERENT click
    # rows when a click's value is NULL (review r9) — the oracle's ranked
    # form returns both fields from the single rn=1 row, so must we.
    # NULL-ts clicks are excluded (review r11): the window orders ts ASC
    # NULLS FIRST, so a NULL-ts click's NON-NULL struct would sort first
    # and last(ignorenulls) would carry it to a purchase with no other
    # prior click — while the oracle's c.ts <= p.ts never matches NULL ts
    # (same latent-null class as the r10 NULL-user guard).
    clicks = ev.filter(
        (F.col("event_type") == "click") & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("c_id"),
        F.struct(
            F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
        ).alias("c"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("long").alias("c_id"),
        F.lit(None).cast("struct<click_ts:timestamp,click_value:double>").alias("c"),
        F.lit(1).alias("side"),
    )
    # side orders clicks before purchases at equal ts => inclusive (>=) as-of;
    # c_id (the click's own event_id, NULL on purchase rows) breaks ties
    # between equal-ts clicks so LOCF is deterministic (review r9) — without
    # it F.last picks whichever tie the shuffle ordered last.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "c_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "event_id",
        "user_id",
        "ts",
        "side",
        F.last("c", ignorenulls=True).over(w).alias("__c"),
    )
    # NULL user_id must carry NOTHING: the window partitions all NULL
    # users together (three-valued-logic trap, review r10 — the operator
    # kernel asof_join already guards this; the inlined headline form did
    # not), while the oracle's equi-join never matches NULL — so the
    # carried struct is masked out for keyless purchases.
    carried = F.when(F.col("user_id").isNotNull(), F.col("__c"))
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        carried.getField("click_ts").alias("click_ts"),
        carried.getField("click_value").alias("click_value"),
    )


# ---------------------------------------------------------------------------
# range join (temporal interval lookup)
# ---------------------------------------------------------------------------

@register(
    "clicks_before_purchase_range_join",
    doc="Bucketed range join: clicks in the hour before each purchase, per "
    "user. Both sides bucket by hour; purchases probe their own and the "
    "previous bucket only, so the join stays equi-keyed on (user, bucket) "
    "and the range predicate filters inside the matched buckets.",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, COUNT(c.event_id) AS n_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id, p.ts
""",
)
def clicks_before_purchase_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(c.cast("double") / 3600).cast("long")  # noqa: E731
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        bucket(F.col("ts")).alias("bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", bucket(F.col("ts")).alias("b"))
        .withColumn("bucket", F.explode(F.array(F.col("b") - 1, F.col("b"))))
    )
    cond = (
        (purchases.user_id == clicks.c_user)
        & (purchases.bucket == clicks.bucket)
        & (clicks.c_ts > purchases.ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts <= purchases.ts)
    )
    return (
        purchases.join(clicks, cond, "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(F.count("c_id").alias("n_clicks"))
    )


@register(
    "rolling_30d_revenue",
    doc="Value-range window frame (RANGE BETWEEN 30 PRECEDING on epoch "
    "days): each order's trailing-30-day revenue for its customer — the "
    "interval-based rolling aggregate ROWS frames can't express (RANGE "
    "includes every order in the window regardless of how many, and "
    "same-day peers are summed symmetrically, so ties need no ordering "
    "tiebreak). Exact DECIMAL accumulation inside the frame, one window "
    "shuffle on the customer key.",
    oracle="""
SELECT o_orderkey, o_custkey,
       date_diff('day', DATE '1970-01-01', o_orderdate) AS epoch_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey
              ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS revenue_30d
FROM orders
""",
)
def rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    epoch_day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_day)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        epoch_day.alias("epoch_day"),
        # direct cast is safe HERE: the frame sum is one customer's trailing
        # 30 days — structurally bounded far below 2^53 scaled units, unlike
        # the corpus-wide sums that use the floor-split kernel (review r11)
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("revenue_30d"),
    )


@register(
    "hierarchy_flatten",
    doc="Hierarchy flattening (BOM/org-chart rollup family; reference "
    "ancestry shape holdings->fund->master): a REAL (child, parent) edge "
    "table — every customer >= 10 points at customer k div 10, roots are "
    "k < 10 with no edge row — resolved to (node, root, depth) through "
    "operators/graph.flatten_hierarchy. Spark has no recursive CTE, so the "
    "operator POINTER-DOUBLES: each round self-joins the pointer relation "
    "on the current ancestor, composing 2^k-step pointers, so "
    "ceil(log2(depth)) keyed shuffles resolve any depth (a million-level "
    "chain costs 20 rounds, not a million joins), with exact depth "
    "accumulation, localCheckpoint-bounded lineage, and a strict "
    "cycle/overflow guard. The oracle is DuckDB's native WITH RECURSIVE — "
    "log-round doubling checked against true recursion.",
    oracle="""
WITH RECURSIVE walk(k, anc, depth) AS (
  SELECT c_custkey, c_custkey // 10, 1
  FROM customer WHERE c_custkey >= 10
  UNION ALL
  SELECT w.k, w.anc // 10, w.depth + 1
  FROM walk w WHERE w.anc >= 10
)
SELECT k AS node, anc AS root, depth
FROM walk WHERE anc < 10
UNION ALL
SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
FROM customer WHERE c_custkey < 10
""",
)
def hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import flatten_hierarchy

    cust = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("node"))
    edges = cust.filter(F.col("node") >= 10).select(
        F.col("node").alias("child"), F.expr("node div 10").alias("parent")
    )
    return flatten_hierarchy(edges, nodes=cust, validate=False)


@register(
    "daily_order_anomaly",
    doc="Time-series anomaly detection: each day's order count scored "
    "against the trailing 30 days (current day excluded) with a z-score "
    "from exact integer window sums — count/sum/sum-of-squares over an "
    "integer-day RANGE frame, moments in double from bit-identical "
    "inputs. Days with |z| >= 2 and at least 20 days of history are "
    "flagged. One pre-aggregation to day grain (tiny), one window over "
    "it — the window input is days, not rows, so the frame cost is "
    "independent of fact-table size.",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS dt,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_no,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
), win AS (
  SELECT dt, n_orders,
         COUNT(*) OVER w AS cnt,
         CAST(SUM(n_orders) OVER w AS BIGINT) AS sx,
         CAST(SUM(n_orders * n_orders) OVER w AS BIGINT) AS sxx
  FROM daily
  WINDOW w AS (ORDER BY day_no RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING)
), scored AS (
  -- cnt*sxx - sx*sx > 0 is the EXACT-integer zero-variance guard: a
  -- constant window would otherwise divide by zero (ANSI abort on Spark,
  -- inf on DuckDB — either way divergent)
  SELECT dt, n_orders, cnt,
         (CAST(n_orders AS DOUBLE) - CAST(sx AS DOUBLE) / cnt)
           / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / cnt) / (cnt - 1)) AS z
  FROM win WHERE cnt >= 20 AND cnt * sxx - sx * sx > 0
)
SELECT dt, n_orders, z FROM scored WHERE abs(z) >= 2
""",
)
def daily_order_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("dt"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "day_no"
        ),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("day_no").rangeBetween(-30, -1)
    win = daily.select(
        "dt",
        "n_orders",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum("n_orders").over(w).alias("sx"),
        F.sum(F.col("n_orders") * F.col("n_orders")).over(w).alias("sxx"),
    ).filter(
        (F.col("cnt") >= 20)
        # exact-integer zero-variance guard: a constant window would divide
        # by zero (ANSI abort here, inf on DuckDB — divergent either way)
        & (F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
    )
    mean = F.col("sx").cast("double") / F.col("cnt")
    var = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    z = (F.col("n_orders").cast("double") - mean) / F.sqrt(var)
    return (
        win.select("dt", "n_orders", z.alias("z"))
        .filter(F.abs(F.col("z")) >= 2)
    )


@register(
    "calendar_gap_fill",
    doc="Calendar densification + LOCF carry (time-series gap fill): each "
    "customer's order history is expanded onto a complete daily date spine "
    "(sequence/explode from first to last order date — DuckDB "
    "generate_series), daily revenue is filled forward (last non-null over "
    "the spine), and the densified series is re-aggregated to per-customer "
    "gap statistics and the carried-revenue integral. The position-carry / "
    "bar-filling shape every market-data pipeline needs; at 100 TB the "
    "spine explode is map-side (rows x avg-span), the only shuffle is the "
    "daily pre-aggregation plus one keyed window.",
    oracle="""
WITH daily AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS dt,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_revenue
  FROM orders GROUP BY 1, 2
), spans AS (
  SELECT custkey, MIN(dt) AS d0, MAX(dt) AS d1 FROM daily GROUP BY custkey
), spine AS (
  SELECT s.custkey, CAST(u.d AS DATE) AS dt
  FROM spans s, UNNEST(generate_series(CAST(s.d0 AS TIMESTAMP), CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS u(d)
), filled AS (
  SELECT sp.custkey, sp.dt, d.day_revenue,
         last_value(d.day_revenue IGNORE NULLS) OVER (
           PARTITION BY sp.custkey ORDER BY sp.dt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS carried
  FROM spine sp LEFT JOIN daily d ON sp.custkey = d.custkey AND sp.dt = d.dt
)
SELECT custkey,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN day_revenue IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_days,
       CAST(SUM(carried) AS DOUBLE) AS carried_revenue
FROM filled
GROUP BY custkey
""",
)
def calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gap_fill_locf

    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").cast("date").alias("dt"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("custkey", "dt")
        .agg(F.sum("price").alias("day_revenue"))
    )
    # unbounded spine: the oracle-checkable semantic-completeness form.
    # PRODUCTION CALLERS AT SCALE USE gap_fill_locf_capped BELOW — this
    # form's spine is customers x full calendar span (~3.5 B rows at sf10,
    # measured to a disk-spill failure, SCALING.md); the capped form bounds
    # every key at last_n_days and is 9-10x cheaper at sf10.
    filled = gap_fill_locf(daily, ["custkey"], "dt", "day_revenue")
    return filled.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("day_revenue").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_gap_days"),
        # per-customer span sum: bounded far below 2^53 scaled units, so the
        # direct cast stays engine-exact (review r11; contrast the
        # corpus-wide floor-split sums above)
        F.sum("carried").cast("double").alias("carried_revenue"),
    )


_GFL_CAP_DAYS = 90


@register(
    "gap_fill_locf_capped",
    doc="The PRODUCTION form of calendar gap fill (r12 verdict item 3): "
    "each customer's daily spine is capped at the trailing 90 days "
    "([max(first, last-89), last]) and the LOCF carry is SEEDED across "
    "the cap — the newest non-null observation strictly before the capped "
    "start, joined back per key from observation rows only — so carried "
    "values on in-range gap days are identical to the unbounded spine's. "
    "At 100 TB this bounds every key at <= 90 spine rows regardless of "
    "history length (the unbounded form is customers x full span: ~3.5 B "
    "rows at sf10, measured to a disk-spill failure), while the seed join "
    "touches only real observations. operators/timeseries.py::gap_fill_locf"
    "(last_n_days=90), sf10-measured at 19.7 s (SCALING.md).",
    oracle=f"""
WITH daily AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS dt,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_revenue
  FROM orders GROUP BY 1, 2
), spans AS (
  SELECT custkey, GREATEST(MIN(dt), MAX(dt) - {_GFL_CAP_DAYS - 1}) AS d0,
         MAX(dt) AS d1
  FROM daily GROUP BY custkey
), spine AS (
  SELECT s.custkey, CAST(u.d AS DATE) AS dt
  FROM spans s, UNNEST(generate_series(CAST(s.d0 AS TIMESTAMP), CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS u(d)
), filled AS (
  SELECT sp.custkey, sp.dt, d.day_revenue,
         last_value(d.day_revenue IGNORE NULLS) OVER (
           PARTITION BY sp.custkey ORDER BY sp.dt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS carried
  FROM spine sp LEFT JOIN daily d ON sp.custkey = d.custkey AND sp.dt = d.dt
), seed AS (
  -- carry-in across the cap: newest NON-NULL observation strictly before
  -- the capped start (mirrors the in-spine IGNORE NULLS carry)
  SELECT custkey, day_revenue AS seed_rev FROM (
    SELECT d.custkey, d.day_revenue,
           ROW_NUMBER() OVER (PARTITION BY d.custkey ORDER BY d.dt DESC) AS rn
    FROM daily d JOIN spans s USING (custkey)
    WHERE d.dt < s.d0 AND d.day_revenue IS NOT NULL
  ) WHERE rn = 1
)
SELECT f.custkey,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN f.day_revenue IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_days,
       CAST(SUM(COALESCE(f.carried, s.seed_rev)) AS DOUBLE) AS carried_revenue
FROM filled f LEFT JOIN seed s ON f.custkey = s.custkey
GROUP BY f.custkey
""",
)
def gap_fill_locf_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gap_fill_locf

    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").cast("date").alias("dt"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("custkey", "dt")
        .agg(F.sum("price").alias("day_revenue"))
    )
    filled = gap_fill_locf(
        daily, ["custkey"], "dt", "day_revenue", last_n_days=_GFL_CAP_DAYS
    )
    return filled.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("day_revenue").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_gap_days"),
        # <= 90 carried values per customer: far below 2^53 scaled units,
        # direct double cast stays engine-exact (same bound argument as
        # calendar_gap_fill above)
        F.sum("carried").cast("double").alias("carried_revenue"),
    )
