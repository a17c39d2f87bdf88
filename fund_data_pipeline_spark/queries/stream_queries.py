"""Streaming catalog queries: the engine's operators executed through
Structured Streaming's incremental path, drained with availableNow and
compared against the same batch-SQL oracles as everything else — the
streaming results are deterministic because windows/dedup-keys/state are
order-independent aggregates.

Determinism scope: the fixture landing zone is a single parquet file, so
every drain is ONE micro-batch and watermarks never drop anything. A
multi-file landing zone drained across several micro-batches is subject
to the declared watermarks (1h on the dedup/join queries): rows arriving
a batch later and more than the watermark older than the seen max are
dropped, as in any Structured Streaming deployment — size the watermark
to the real out-of-orderness of the feed, or the batch oracle and the
stream will legitimately diverge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..streaming.streams import read_events_stream, run_to_memory
from .registry import register


@register(
    "streaming_tumbling_counts",
    doc="Tumbling 5-minute event-time window per type, executed as a "
    "Structured Streaming query (watermark 10m, complete mode, availableNow "
    "drain) over the events landing zone. Same result as the batch window.",
    oracle="""
SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS window_start_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
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
    return run_to_memory(agg, "complete")


@register(
    "streaming_dedup_users",
    doc="Streaming dropDuplicates on (user_id, event_type) drained "
    "append-mode to a sink, then a batch count per type — incremental "
    "EXACT distinct-user tracking over the landing zone. No watermark: "
    "exact distinct state is necessarily keyed forever, and it is bounded "
    "by the ENTITY domain (|users| x |event_types|), not stream length — "
    "the right cost model for a user dimension; a time-bounded "
    "approximation is dropDuplicatesWithinWatermark (review r10: a "
    "watermark declared next to a plain dropDuplicates is silently "
    "ignored — Spark only evicts when the event-time column is part of "
    "the dedup subset). NULL user_ids stay in the dedup (one NULL row per "
    "type, bounded state) and are skipped by the final count(user_id) — "
    "previously they were filtered before dedup, so an event_type whose "
    "EVERY user_id is NULL vanished from the result while the oracle's "
    "GROUP BY keeps the group with n_users = 0 (review r11).",
    oracle="SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type",
)
def streaming_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    deduped = ev.dropDuplicates(["user_id", "event_type"])
    sink = run_to_memory(deduped.select("user_id", "event_type"), "append")
    return sink.groupBy("event_type").agg(F.count("user_id").alias("n_users"))


_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_q_sum", LongType()),
        # non-null value count: distinguishes "sum of zero values" (NULL,
        # like SQL SUM over an all-NULL group) from a true zero sum (r10)
        StructField("n_values", LongType()),
    ]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_q_sum", LongType()),
    ]
)


def _user_stats_fn(key, pdf_iter, state: GroupState):
    """Stateful per-user accumulator: event count + exact quantized value sum.

    Values are quantized with floor(value * 1e6) (identical semantics in
    numpy and the SQL oracle) so the accumulation is exact integer math —
    deterministic regardless of batch/arrival order. O(1) state per key.
    """
    n, q, nn = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        v = pdf["value"].to_numpy()
        # NaN (a NULL value) must be skipped like the oracle's SUM skips
        # NULLs — np.floor(NaN).astype(int64) silently yields INT64_MIN
        v = v[~np.isnan(v)]
        nn += len(v)
        q += int(np.floor(v * 1e6).astype("int64").sum())
    state.update((n, q, nn))
    # SQL SUM over an all-NULL group is NULL, not 0 (review r10): emit a
    # nullable Int64 so a user whose every event has NULL value matches
    # the oracle instead of reporting a phantom zero sum
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_q_sum": pd.array([q if nn else None], dtype="Int64"),
        }
    )


@register(
    "streaming_stateful_user_stats",
    doc="Custom stateful streaming operator via applyInPandasWithState: "
    "per-user running stats (count, exact quantized sum) emitted in update "
    "mode. The extension point for bespoke state machines (G2/G3-style "
    "repair feeds) that windowed aggregation can't express.",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS value_q_sum
FROM events GROUP BY user_id
""",
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    stats = ev.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = run_to_memory(stats, "update")
    # update mode re-emits a key's latest state each batch; keep the final row
    # (single-batch here, but correct under maxFilesPerTrigger>1 too).
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_q_sum", "n_events").alias("value_q_sum"),
    )


@register(
    "streaming_session_counts",
    doc="Native session windows (session_window, 30-minute gap) per user on "
    "the streaming path, drained with availableNow in complete mode — the "
    "operator-native form of the batch sessionization query (which builds "
    "sessions from lag+cumsum). Same sessions, same exact-integer outputs.",
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
SELECT user_id,
       COUNT(*) AS n_events,
       MIN(ep_us) AS session_start_us,
       MAX(ep_us) AS session_end_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS session_value_cents
FROM sessions
GROUP BY user_id, session_seq
""",
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session semantics parity note: Spark MERGES an event that lands
    exactly gap-after the previous one into the same session (verified
    empirically on session_window), and the oracle's ``gap > 30min -> new
    session`` likewise keeps an exact-gap event in the current session —
    both treat the boundary inclusively, so the session sets agree.
    (Tightening the oracle to ``>=`` WOULD diverge on exact-gap fixtures.)
    session_window.end is last_event + gap, so the oracle's MAX(ep_us) is
    recovered as end - gap."""
    ev = read_events_stream(spark, sf_dir)
    gap_us = 30 * 60 * 1_000_000
    agg = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("session_value_cents"),
        )
        .select(
            "user_id",
            "n_events",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            (F.unix_micros(F.col("w.end")) - F.lit(gap_us)).alias("session_end_us"),
            "session_value_cents",
        )
    )
    return run_to_memory(agg, "complete")


@register(
    "streaming_click_purchase_join",
    doc="Stream-stream inner join with event-time range condition and "
    "watermarks on BOTH sides (the state-cleanup contract of Spark "
    "stream-stream joins): clicks in the hour before each purchase, "
    "self-joined from the same landing stream, drained append-mode, then "
    "batch-aggregated to per-purchase click counts. Completes the "
    "streaming surface: windows, dedup, custom state, and joins.",
    oracle="""
SELECT p.event_id, p.user_id, COUNT(c.event_id) AS n_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id
""",
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "user_id = c_user AND c_ts > ts - INTERVAL 1 HOUR AND c_ts <= ts"
        ),
        "inner",
    )
    sink = run_to_memory(joined.select("event_id", "user_id", "c_id"), "append")
    return sink.groupBy("event_id", "user_id").agg(F.count("c_id").alias("n_clicks"))


@register(
    "streaming_enriched_purchases",
    doc="Stream-static join: the purchase stream enriched against the "
    "static customer dimension (no state, no watermark needed on the "
    "static side), drained append-mode, then aggregated to exact per-"
    "segment totals. With stream-stream (streaming_click_purchase_join) "
    "this completes the streaming join surface. The join strategy is "
    "deliberately left to the planner's size estimate: the customer "
    "dimension is SF-LINEAR (150k rows x SF — billions of rows at the "
    "100 TB design point), so a forced broadcast hint would turn scale "
    "growth into a driver OOM re-shipped every micro-batch; Spark "
    "broadcasts it only while it genuinely fits under the threshold and "
    "falls back to a shuffled stream-static join otherwise (r12, per the "
    "r11 verdict — the same hint class removed from top_unshipped_orders "
    "and benchmark_contamination in r10).",
    oracle="""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
GROUP BY 1
""",
)
def streaming_enriched_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import table

    ev = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(cust, ev["user_id"] == cust["c_custkey"], "inner")
    sink = run_to_memory(joined.select("c_mktsegment", "value"), "append")
    return sink.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
