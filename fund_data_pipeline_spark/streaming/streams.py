"""Structured Streaming layer.

The reference is strictly daily batch (SURVEY §2.14: cron at
/root/reference/cron_schedule:8; no watermarks, no stream state anywhere),
so this module is the rebuild's forward-looking extension justified by the
``events`` fixture: the same engine operators executed through Spark's
incremental execution path — file-source landing zone, watermarked event-time
windows, streaming dedup, and an ``applyInPandasWithState`` custom stateful
operator (the extension point a NAV tick feed would use).

Design notes for scale:
- Source is a file-stream over the landing directory (``maxFilesPerTrigger``
  bounds batch size; at 100 TB the landing zone is date-partitioned and each
  micro-batch is one partition's new files).
- Watermarks bound all state; nothing here keeps unbounded per-key state
  except the explicitly-stateful demo operator, whose state is O(1) per key.
- Every query below runs with ``trigger(availableNow=True)``: drain what is
  in the landing zone, emit, stop — the streaming analog of the reference's
  daily batch run, and exactly how a cron-scheduled incremental Spark job
  would consume the feed.
"""

from __future__ import annotations

import itertools
import threading

from pyspark.sql import DataFrame, SparkSession

_SINK_IDS = itertools.count()

#: serializes drains that pin the session-global shuffle-partitions conf:
#: two concurrent save/set/restore sequences can interleave so one drain
#: "restores" the OTHER's pinned value, leaving the shared session at 8
#: partitions for every later batch query (review r11)
_CONF_LOCK = threading.Lock()


def read_events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the events landing zone.

    ``ts`` is normalized to TimestampType exactly like the batch reader
    (queries.registry.table): watermarks require TIMESTAMP, and on Spark 4.x
    the fixture's timestamp-without-timezone parquet reads as TIMESTAMP_NTZ.
    """
    from ..session import normalize_event_ts, normalize_session

    normalize_session(spark)
    # pinned read contract (same as the batch reader) — skips the batch
    # footer-inference job a schema-less readStream would need anyway
    from ..queries.registry import FIXTURE_SCHEMAS

    schema = FIXTURE_SCHEMAS["events"]
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(sf_dir)
    )
    return normalize_event_ts(sdf)


def run_to_memory(sdf: DataFrame, mode: str, shuffle_partitions: int | None = 8) -> DataFrame:
    """Execute a streaming DataFrame to completion into an in-memory sink
    (availableNow trigger: drain-all-then-stop) and return the sink table.

    ``shuffle_partitions`` is pinned (default 8) for the duration of the
    drain: each stateful shuffle partition owns a state-store instance and
    (for pandas-stateful ops) a Python worker, so partition count is pure
    fixed cost at small state sizes. A real deployment sizes this to key
    cardinality / executor count; AQE cannot help because stateful streaming
    shuffles are not adaptive."""
    spark = sdf.sparkSession
    name = f"stream_sink_{next(_SINK_IDS)}"
    if shuffle_partitions is not None:
        _CONF_LOCK.acquire()
        # anything that throws between acquire and the inner finally below
        # (e.g. conf.get/set on a stopped session) must still release the
        # lock, or every later drain with pinned partitions deadlocks
        try:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        except BaseException:
            _CONF_LOCK.release()
            raise
    else:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
    # detach the result from the memory sink: the sink table would
    # otherwise stay registered (and pinned in driver memory) for the life
    # of the session — one leaked result set per streaming query run. The
    # eager localCheckpoint copies the rows into managed blocks that the
    # ContextCleaner releases once the returned DataFrame is unreachable.
    # dropTempView runs in a finally so a query that THROWS mid-drain
    # (bad file, state-function error) cannot leak its partially-filled
    # sink either (review r9); it is a no-op when start() failed before
    # the sink was registered.
    try:
        try:
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            if shuffle_partitions is not None:
                # the conf restore can itself throw (session stopped
                # mid-drain) — the lock must release regardless, or every
                # later caller deadlocks (ADVICE r12; same class as the
                # entry-path leak fixed r12)
                try:
                    spark.conf.set("spark.sql.shuffle.partitions", prev)
                finally:
                    _CONF_LOCK.release()
        return spark.table(name).localCheckpoint()
    finally:
        spark.catalog.dropTempView(name)
