"""Hash-guarded keyed upsert over Parquet — the engine's signature operator.

Reproduces the reference's ``INSERT ... ON CONFLICT ON CONSTRAINT <uq>
DO UPDATE SET ... WHERE target.row_hash IS DISTINCT FROM excluded.row_hash``
(src/utils/db_connector.py:380-419, 02_performance_sync/03_price_history_loader.py:32-63,
01_master_sync/04_master_list_loader.py:69-85) as a Delta-style MERGE built
from a full-outer join, with no transactional-format dependency:

    target' = FULL OUTER JOIN(target, source, keys)
              WHEN MATCHED AND NOT (t.hash <=> s.hash) THEN source row
                                                            (preserve_cols kept)
              WHEN MATCHED (hash equal)                 THEN target row (write
                                                            elision: audit cols
                                                            untouched)
              WHEN NOT MATCHED BY TARGET                THEN insert source row
              WHEN NOT MATCHED BY SOURCE                THEN keep target row

Write discipline: new snapshot goes to ``<path>.__staging__`` then swaps in
atomically (write-temp-then-rename), so a failed job never corrupts the
table (SURVEY §7.4-1).

Scale notes (100 TB):
- The join shuffles both sides by the natural key — unavoidable for a keyed
  merge without a transactional format; on a cluster, bucketed tables on the
  key make it shuffle-free on the target side.
- When the table is date-partitioned and the batch touches few partitions,
  pass ``partition_filter`` to rewrite only affected partitions (classic
  hive-style MERGE pruning) instead of the whole table.
- Daily batches are small relative to the table: the source side is
  broadcast automatically by AQE when under the threshold.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import dedup_keyed


@dataclass
class MergeStats:
    inserted: int
    updated: int
    unchanged: int
    deleted_by_retention: int = 0


def _null_safe_ne(left: Column, right: Column) -> Column:
    return ~left.eqNullSafe(right)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    hash_col: str = "row_hash",
    preserve_cols: Sequence[str] = (),
    always_update_cols: Sequence[str] = (),
    unconditional: bool = False,
    dedupe_order: Sequence[str] | None = None,
    collect_stats: bool = False,
) -> MergeStats:
    """Upsert ``source`` into the Parquet table at ``target_path``.

    - ``preserve_cols``: target wins on matched rows (e.g. ``first_seen`` — L1).
    - ``always_update_cols``: source wins on matched rows even when the hash
      is unchanged (e.g. ``last_seen`` freshness on the master table — K5).
      Default empty: the reference's hash guard skips the whole UPDATE when
      the hash matches (db_connector.py:400-405), so audit columns stay
      untouched on unchanged rows.
    - ``unconditional=True``: K5's always-update semantics (no hash guard),
      used by the master loader; default is the H8 hash guard.
    - ``dedupe_order``: tiebreak columns making the batch one-row-per-key
      (required for a deterministic merge; defaults to the key itself).
    """
    keys = list(keys)
    source = dedup_keyed(source, keys, list(dedupe_order) if dedupe_order else keys, keep="last")

    path = Path(target_path)
    if not path.exists():
        stats = MergeStats(inserted=source.count() if collect_stats else -1, updated=0, unchanged=0)
        _atomic_write(source, path)
        return stats

    target = spark.read.parquet(str(path))
    out_cols = target.columns

    t = target.alias("t")
    s = source.alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")

    s_present = F.col(f"s.{keys[0]}").isNotNull()
    # use a non-key col for target presence when key cols could be null-joined
    t_present = F.col(f"t.{keys[0]}").isNotNull()
    if unconditional:
        changed = F.lit(True)
    else:
        changed = _null_safe_ne(F.col(f"t.{hash_col}"), F.col(f"s.{hash_col}"))

    preserve = set(preserve_cols)
    always = set(always_update_cols)

    merged_cols: list[Column] = []
    for c in out_cols:
        s_c = F.col(f"s.{c}") if c in source.columns else F.lit(None)
        t_c = F.col(f"t.{c}")
        if c in keys:
            expr = F.coalesce(t_c, s_c)
        elif c in preserve:
            expr = F.when(t_present, t_c).otherwise(s_c)
        elif c in always:
            expr = F.when(s_present, s_c).otherwise(t_c)
        else:
            expr = (
                F.when(~t_present, s_c)
                .when(~s_present, t_c)
                .when(changed, s_c)
                .otherwise(t_c)
            )
        merged_cols.append(expr.alias(c))

    action = (
        F.when(~t_present, F.lit("insert"))
        .when(~s_present, F.lit("keep"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    result = joined.select(*merged_cols, action.alias("__action"))

    stats = MergeStats(-1, -1, -1)
    if collect_stats:
        counts = {r["__action"]: r["n"] for r in result.groupBy("__action").agg(F.count(F.lit(1)).alias("n")).collect()}
        stats = MergeStats(
            inserted=counts.get("insert", 0),
            updated=counts.get("update", 0),
            unchanged=counts.get("unchanged", 0) + counts.get("keep", 0),
        )

    _atomic_write(result.drop("__action"), path)
    return stats


def _atomic_write(df: DataFrame, path: Path) -> None:
    """Write-temp-then-swap: the table directory is replaced in one rename."""
    staging = path.with_name(path.name + ".__staging__")
    backup = path.with_name(path.name + ".__old__")
    if staging.exists():
        shutil.rmtree(staging)
    df.write.mode("overwrite").parquet(str(staging))
    if path.exists():
        path.rename(backup)
    staging.rename(path)
    if backup.exists():
        shutil.rmtree(backup)


def merge_as_dataframe(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    hash_col: str = "row_hash",
    preserve_cols: Sequence[str] = (),
) -> DataFrame:
    """Pure-DataFrame MERGE (no I/O): returns the post-merge relation.

    Used by the oracle-checked queries and anywhere the caller manages
    persistence itself. Same semantics as :func:`merge_upsert`.
    """
    keys = list(keys)
    t = target.alias("t")
    s = source.alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    t_present = F.col(f"t.{keys[0]}").isNotNull()
    s_present = F.col(f"s.{keys[0]}").isNotNull()
    changed = _null_safe_ne(F.col(f"t.{hash_col}"), F.col(f"s.{hash_col}"))
    preserve = set(preserve_cols)
    cols = []
    for c in target.columns:
        s_c = F.col(f"s.{c}") if c in source.columns else F.lit(None)
        t_c = F.col(f"t.{c}")
        if c in keys:
            expr = F.coalesce(t_c, s_c)
        elif c in preserve:
            expr = F.when(t_present, t_c).otherwise(s_c)
        else:
            expr = (
                F.when(~t_present, s_c).when(~s_present, t_c).when(changed, s_c).otherwise(t_c)
            )
        cols.append(expr.alias(c))
    return joined.select(*cols)
