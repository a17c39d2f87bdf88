"""Failed-row repair feed (SURVEY §2.12 G2, §2.6 U3).

Rebuilds the reference NAV repair pass
(src/02_daily_performance/financial_times/03_ft_nav_repair.py):

- :39-54   failed-subset selection — rows whose ``status != 'Success'``,
           with a fallback predicate (null/zero nav_price) when the table
           has no status column (U3: failed-subset recompute).
- :92-101  repaired rows re-enter the pipeline stamped ``status='Repaired'``.
- :129-139 repaired rows are merged into the main table and appended to a
           repair log.

Spark-first shape: the reference loops a headless browser over failed
tickers on the driver; that re-fetch (S9, out of scope per SURVEY §2.1) is
abstracted as a caller-supplied ``reprocess: DataFrame -> DataFrame``
transform — at scale a join against a corrected feed, a re-parse of the raw
landing files, or a ``mapInPandas`` re-fetch. The whole repair is then one
declarative plan: filter failed -> recompute -> stamp status -> keyed merge.
No driver-side iteration: a 100 TB pipeline's failed subset is itself a
table, and the merge cost stays proportional to the batch (partition-pruned
layout) rather than the table.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..merge import MergeStats, merge_upsert, read_table


def failed_subset(
    df: DataFrame,
    status_col: str = "status",
    success_values: str | Sequence[str] = "Success",
    fallback_predicate: Column | None = None,
) -> DataFrame:
    """U3: the rows of a result table that need recomputation.

    Mirrors 03_ft_nav_repair.py:46-50: when ``status_col`` exists, failed =
    status not among ``success_values`` (NULL status counts as failed — a
    row that never got a verdict must be retried); otherwise the caller's
    fallback predicate (the reference falls back to ``nav_price is NaN or
    0``). ``success_values`` is a set because repaired rows are terminal
    too: a repair pass must not re-select what the previous pass fixed, or
    the feed never converges.
    """
    if status_col in df.columns:
        values = [success_values] if isinstance(success_values, str) else list(success_values)
        ok = F.lit(False)
        for v in values:
            ok = ok | F.col(status_col).eqNullSafe(F.lit(v))
        return df.filter(~ok)
    if fallback_predicate is not None:
        return df.filter(fallback_predicate)
    raise ValueError(
        f"table has no {status_col!r} column and no fallback_predicate was given"
    )


@dataclass
class RepairStats:
    n_failed: int
    n_repaired: int
    merge: MergeStats | None


def repair_feed(
    spark: SparkSession,
    target_path: str,
    reprocess: Callable[[DataFrame], DataFrame],
    keys: Sequence[str],
    *,
    status_col: str = "status",
    success_value: str = "Success",
    repaired_value: str = "Repaired",
    fallback_predicate: Column | None = None,
    repair_log_path: str | None = None,
    **merge_kwargs,
) -> RepairStats:
    """G2: re-feed a table's failed rows and merge the repairs back.

    1. Read the table at ``target_path`` (layout-aware via
       :func:`~fund_data_pipeline_spark.merge.read_table`).
    2. ``failed_subset`` selects the retry feed; an empty feed returns
       immediately with no write (the reference's "Perfect run!" path,
       :110-113).
    3. ``reprocess(failed)`` recomputes the failed rows. It may return fewer
       rows than it was given — unrepairable rows simply keep their failed
       status in the target (the reference's per-ticker ``return None``).
    4. Survivors are stamped ``status_col = repaired_value`` and merged on
       ``keys`` (``merge_kwargs`` pass through to
       :func:`~fund_data_pipeline_spark.merge.merge_upsert` — hash guard,
       partition pruning, layout). When ``repair_log_path`` is set the
       repaired batch is also appended there (the ft_repair_log.csv analog,
       as parquet).

    Status-less targets (the ``fallback_predicate`` path): the merge keeps
    the target's own columns, so the stamp survives only in the repair log
    — exactly the reference's behavior (03_ft_nav_repair.py:129-133 drops
    ``status`` before the DB insert and keeps it in ft_repair_log.csv).

    The failed subset is pinned with an eager ``localCheckpoint`` up front:
    one scan of the target serves the count, the reprocess input, and the
    log write — and because the merge rewrites the very files this lineage
    read, the lineage is truncated rather than trusted to never recompute
    mid-swap. Checkpoint size is the failed subset, not the table.
    """
    current = read_table(spark, target_path)
    failed = failed_subset(
        current, status_col, (success_value, repaired_value), fallback_predicate
    ).localCheckpoint(eager=True)
    n_failed = failed.count()
    if n_failed == 0:
        return RepairStats(0, 0, None)
    # pinned too: the reprocess step (often a re-fetch or an expensive join)
    # feeds the count, the log write, and the merge — compute it once
    repaired = (
        reprocess(failed)
        .withColumn(status_col, F.lit(repaired_value))
        .localCheckpoint(eager=True)
    )
    n_repaired = repaired.count()
    if repair_log_path is not None:
        repaired.write.mode("append").parquet(repair_log_path)
    stats = merge_upsert(spark, target_path, repaired, keys=keys, **merge_kwargs)
    return RepairStats(n_failed, n_repaired, stats)
