"""Incremental daily-NAV loader: landing-zone stream -> foreachBatch merge.

The streaming counterpart of :mod:`..pipelines.daily_nav` (reference entry
point 3): the same clean -> validate -> hash transforms run over a file
stream of the landing zone, and each micro-batch is upserted with the same
hash-guarded merge the batch loader uses. This is the ForeachBatch landing
pattern SURVEY §2.1-S9 calls for — the scrapers keep dropping CSVs, Spark
drains whatever is new.

Semantics that make this safe:
- The merge is idempotent (hash guard H8 + keyed dedup), so micro-batch
  replays after a failure cannot duplicate or clobber rows — exactly-once
  *effect* from at-least-once delivery.
- ``availableNow`` drains mean one invocation behaves like the reference's
  daily cron run; leaving the query running turns the same code into a
  continuous loader. Checkpointing tracks which files were consumed.

Scale: each micro-batch merge shuffles only on the natural key; the landing
file stream lists incrementally (no full re-scan), and ``maxFilesPerTrigger``
bounds per-batch work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..merge import merge_upsert
from ..pipelines import daily_nav
from ..schemas import DAILY_NAV_KEY


def start_nav_stream(
    spark: SparkSession,
    landing_dir: str,
    target_path: str,
    checkpoint_dir: str,
    schema: str = "ticker string, asset_type string, source string, nav_price string, "
    "currency string, as_of_date string, scrape_date string",
    max_files_per_trigger: int = 16,
    rollup_path: str | None = None,
    rollup_group_cols: tuple[str, ...] = ("source",),
    rollup_measures=None,
    errors_path: str | None = None,
):
    """Drain new landing CSVs into the NAV table; returns the StreamingQuery.

    Call ``.awaitTermination()`` on the result for a one-shot availableNow
    drain (the daily-batch analog).

    ``rollup_path`` (+ ``rollup_group_cols`` / ``rollup_measures``, see
    :mod:`..rollup`) switches the merge to the ``as_of_date``-partitioned
    layout and, after each micro-batch lands, refreshes the continuous
    aggregate for exactly the dates that batch touched — the full
    incremental pipeline: new files -> keyed merge of the touched
    partitions -> rollup refresh of the same partitions. Per-batch cost
    stays proportional to the batch's dates, independent of history
    length; a batch replay re-merges idempotently and re-derives the same
    rollup rows, so exactly-once *effect* is preserved end to end.

    Enabling ``rollup_path`` on a target previously loaded WITHOUT it
    changes the merge to the date-partitioned layout; the merge's layout
    guard refuses that write against the existing flat table (mixed
    layouts corrupt reads) — migrate the table once (read -> partitioned
    rewrite) before switching modes.

    ``errors_path``: each micro-batch's quarantined rows (the validate
    split's failure side) land under ``errors_path/batch_id=N`` (overwrite
    per batch, so a replayed micro-batch replaces rather than duplicates
    its own quarantine output) — without it the batch loader's quarantine
    accounting would silently vanish in streaming mode.

    Cross-batch staleness: the hash-guarded merge updates on ANY hash
    difference, so a re-delivered OLD file drained in a later micro-batch
    would overwrite newer rows. Each batch therefore drops rows whose
    ``scrape_date`` is older than the stored one (keys without a stored
    ``scrape_date`` always pass) — the cross-batch form of the batch
    loader's keep-last-by-scrape_date dedup. The guard scan is pruned to
    the batch's ``as_of_date`` partitions in rollup mode.
    """
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        # enforceSchema=false makes Spark VERIFY the CSV header against the
        # schema instead of binding columns positionally — a landing file
        # with reordered or synonym headers fails loudly rather than
        # silently merging source values into asset_type (the batch reader
        # maps by header name; the stream cannot, so it must verify)
        .option("enforceSchema", "false")
        .option("pathGlobFilter", "*.csv")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .csv(landing_dir)
    )

    def load_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..merge import detect_layout, read_table, touched_partition_filter

        cleaned = daily_nav.clean(batch_df)
        valid, errors = daily_nav.validate_split(cleaned)
        if errors_path is not None and not errors.isEmpty():
            # Idempotent quarantine (review r9): foreachBatch may replay a
            # micro-batch whose quarantine write already landed (write
            # succeeded, merge crashed before the checkpoint commit). A
            # plain append would re-add the same rows; writing each batch
            # to its own batch_id=N partition directory in overwrite mode
            # makes the replay replace, not duplicate. Readers see batch_id
            # as a discovered partition column on errors_path.
            errors.write.mode("overwrite").parquet(
                f"{errors_path}/batch_id={batch_id}"
            )
        batch = daily_nav.prepare_load(valid)
        if batch.isEmpty():
            return
        if detect_layout(target_path) is not None:
            # drop rows staler than what the table already holds (see doc)
            current = read_table(spark, target_path)
            if rollup_path is not None:
                dates = [r[0] for r in batch.select("as_of_date").distinct().collect()]
                current = current.filter(touched_partition_filter("as_of_date", dates))
            stored = current.select(
                *DAILY_NAV_KEY, F.col("scrape_date").alias("__stored_sd")
            )
            fresh = F.col("__stored_sd").isNull() | (
                F.col("scrape_date").isNotNull()
                & (F.col("scrape_date") >= F.col("__stored_sd"))
            )
            batch = batch.join(stored, DAILY_NAV_KEY, "left").filter(fresh).drop("__stored_sd")
            # materialize NOW: the guarded batch lazily reads the target's
            # current files, which the merge below replaces — a later
            # re-evaluation (touched-dates collect, swap staging) would hit
            # deleted files. A micro-batch is small by construction.
            batch = batch.localCheckpoint()
            if batch.isEmpty():
                return
        if rollup_path is None:
            merge_upsert(spark, target_path, batch, DAILY_NAV_KEY)
            return
        from pyspark.sql import functions as F

        from ..merge import read_table
        from ..rollup import refresh_rollup

        merge_upsert(
            spark, target_path, batch, DAILY_NAV_KEY, partition_col="as_of_date"
        )
        # bounded collect: the distinct dates of one micro-batch
        touched = [r[0] for r in batch.select("as_of_date").distinct().collect()]
        measures = rollup_measures or {"n_quotes": F.count(F.lit(1))}
        refresh_rollup(
            read_table(spark, target_path),
            rollup_path,
            partition_col="as_of_date",
            group_cols=list(rollup_group_cols),
            measures=measures,
            touched=touched,
        )

    return (
        raw.writeStream.foreachBatch(load_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
