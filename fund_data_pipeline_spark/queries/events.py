"""Event-time analytics over the ``events`` fixture (SURVEY §2.14 extension).

The reference is batch-only; these operators give the engine the windowed /
sessionized capability a streaming NAV feed would need, expressed so the
identical logic runs under Structured Streaming (the streaming module reuses
the same tumbling-window shape with a watermark).

Timestamp discipline: window starts are exchanged as epoch seconds (BIGINT)
— engines disagree on timestamp-nanosecond printing, epoch math is exact.
Value sums go through DECIMAL casts as everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table


@register(
    "tumbling_window_stats",
    headline=True,
    doc="Tumbling 5-minute window per event_type: count + exact decimal sum. "
    "Spark side uses the native window() operator (streaming-compatible).",
    oracle="""
SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS window_start_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sliding_window_stats",
    doc="Hopping window (10 min length, 5 min hop): each event lands in two "
    "windows; implemented natively with window(), oracle via explicit hop join.",
    oracle="""
SELECT w.window_start_epoch, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
CROSS JOIN (SELECT unnest([0, 1]) AS k) k
CROSS JOIN LATERAL (
  SELECT CAST(floor(epoch(e.ts) / 300) AS BIGINT) * 300 - k.k * 300 AS window_start_epoch
) w
GROUP BY w.window_start_epoch
""",
)
def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "n_events",
            "total_value",
        )
    )


@register(
    "sessionization",
    doc="Session windows with a 30-minute inactivity gap per user: lag(ts) + "
    "cumulative gap-count defines session ids; the classic shuffle-once, "
    "window-twice pattern (no driver loops). All exchanged columns are exact "
    "BIGINTs: gaps/epochs in integer microseconds (no truncation-vs-floor "
    "asymmetry possible), session values in integer cents (no DOUBLE in the "
    "output at all), session_seq cast from DuckDB's HUGEINT window-SUM.",
    oracle="""
WITH base AS (
  SELECT user_id, ts, event_id, value, epoch_us(ts) AS ep_us
  FROM events
), gaps AS (
  SELECT user_id, ts, event_id, value, ep_us,
         CASE WHEN ep_us - LAG(ep_us) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 THEN 1 ELSE 0 END AS is_new_session
  FROM base
), sessions AS (
  SELECT user_id, event_id, value, ep_us,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gaps
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       MIN(ep_us) AS session_start_us,
       MAX(ep_us) AS session_end_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS session_value_cents
FROM sessions
GROUP BY user_id, session_seq
""",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # ts arrives as TimestampType from table() (normalize_event_ts); under the
    # UTC-pinned session unix_micros matches DuckDB's naive epoch_us exactly.
    ep_us = F.unix_micros(F.col("ts"))
    gap = ep_us - F.lag(ep_us).over(w)
    with_session = ev.withColumn(
        "is_new_session", F.when(gap > 30 * 60 * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    ).withColumn("session_seq", F.sum("is_new_session").over(frame).cast("long"))
    return with_session.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ep_us).alias("session_start_us"),
        F.max(ep_us).alias("session_end_us"),
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("session_value_cents"),
    )


@register(
    "event_type_summary",
    doc="Per-type event stats: counts, exact sums, min/max event time as epoch.",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(floor(MIN(epoch(ts))) AS BIGINT) AS first_epoch,
       CAST(floor(MAX(epoch(ts))) AS BIGINT) AS last_epoch
FROM events GROUP BY event_type
""",
)
def event_type_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.min(F.col("ts").cast("long")).alias("first_epoch"),
        F.max(F.col("ts").cast("long")).alias("last_epoch"),
    )


@register(
    "json_props_extraction",
    doc="Semi-structured extraction: pull k out of the JSON props column "
    "(get_json_object / JSON path on both engines). Contract: k_value is "
    "NULL unless k is an INTEGER JSON number — Spark's string->bigint "
    "try_cast rejects '1.9' while DuckDB's rounds it to 2 (review r10), "
    "so the oracle pins strictness with an explicit integer-text guard.",
    oracle="""
SELECT event_id,
       CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
            THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k_value
FROM events
""",
)
def json_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = F.get_json_object("props", "$.k")
    # the integer-text guard must live on BOTH engines: Spark's try_cast
    # alone accepts '+5' / ' 5 ' (ANSI cast trims and allows a leading +)
    # that the oracle's ^-?[0-9]+$ rejects (review r11)
    return ev.select(
        "event_id",
        F.when(v.rlike("^-?[0-9]+$"), v.try_cast("bigint")).alias("k_value"),
    )


@register(
    "conversion_funnel",
    doc="Ordered conversion funnel view -> click -> purchase per user: each "
    "stage counts users whose first stage-event strictly follows their "
    "first event of the previous stage. Three filtered per-user aggregates "
    "chained by equi-joins on user_id — shuffle cost is O(users per "
    "stage), shrinking down-funnel; no window over the full event stream.",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel
""",
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ep = F.unix_micros(F.col("ts"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ep).alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("ep", ep)
        .join(v, "user_id")
        .filter(F.col("ep") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ep").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("ep", ep)
        .join(c, "user_id")
        .filter(F.col("ep") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ep").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@register(
    "cohort_retention",
    doc="Classic cohort-retention matrix over the event stream: users are "
    "cohorted by first-seen day, activity is distinct (user, day), and "
    "each cell counts cohort users still active at day-offset N. Two hash "
    "aggregates plus one equi-join on user_id — the join key is the "
    "natural shuffle key, cohort assignment broadcast-sized relative to "
    "events at scale (one row per user).",
    oracle="""
WITH cohort AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
)
SELECT c.cohort_date,
       date_diff('day', c.cohort_date, a.active_date) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY c.cohort_date, date_diff('day', c.cohort_date, a.active_date)
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_date"))
    activity = ev.select("user_id", F.col("ts").cast("date").alias("active_date")).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff("active_date", "cohort_date").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "running_distinct_users",
    doc="Expanding-window distinct count (cumulative unique buyers by "
    "month). Neither engine supports COUNT(DISTINCT) over a window frame; "
    "the scalable identity is the first-seen trick: mark each customer's "
    "first order month (min per customer — one hash agg), count first "
    "appearances per month, then a cumulative sum over the month-grain "
    "relation. State is one row per customer for the min-agg and one per "
    "month for the running sum — no per-frame distinct materialization at "
    "any scale.",
    oracle="""
WITH first_seen AS (
  SELECT o_custkey, MIN(strftime(o_orderdate, '%Y-%m')) AS first_month
  FROM orders GROUP BY o_custkey
), per_month AS (
  SELECT first_month AS month, COUNT(*) AS new_buyers FROM first_seen GROUP BY first_month
)
SELECT month,
       CAST(new_buyers AS BIGINT) AS new_buyers,
       CAST(SUM(new_buyers) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_buyers
FROM per_month
""",
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    first_seen = orders.groupBy("o_custkey").agg(
        F.min(F.date_format("o_orderdate", "yyyy-MM")).alias("first_month")
    )
    per_month = first_seen.groupBy(F.col("first_month").alias("month")).agg(
        F.count(F.lit(1)).alias("new_buyers")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_month.select(
        "month",
        "new_buyers",
        F.sum("new_buyers").over(w).alias("cumulative_buyers"),
    )
