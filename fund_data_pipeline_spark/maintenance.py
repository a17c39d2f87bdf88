"""Retention / archive lifecycle (SURVEY §2.2 K6-K8).

The reference archives stage directories as zips and purges archives older
than 60 days by walking date-named directories
(src/maintenance/retention_cleaner.py:16-47, cleanup_old_data.py:16-47,
01_master_sync/06_master_data_archiver.py:37-77). On a data lake the same
lifecycle is partition management over ``dt=YYYY-MM-DD`` layouts: snapshots
are immutable partitioned writes; "archive" is a no-op (the write IS the
archive); retention is a partition-pruned delete.
"""

from __future__ import annotations

import re
import shutil
from datetime import date, timedelta
from pathlib import Path

RETENTION_DAYS = 60  # retention_cleaner.py:16
_DT_DIR = re.compile(r"^dt=(\d{4}-\d{2}-\d{2})$")


def snapshot(df, root: str, dt: str) -> None:
    """K6/K7: write an immutable dated snapshot partition."""
    df.write.mode("overwrite").parquet(f"{root}/dt={dt}")


def purge_expired_partitions(root: str, today: date | None = None, retention_days: int = RETENTION_DAYS) -> list[str]:
    """K8: drop ``dt=`` partitions older than the retention cutoff.

    Pure partition pruning — no data is read; on a cluster this is the
    metastore's DROP PARTITION / a storage-layer lifecycle rule.
    """
    today = today or date.today()
    cutoff = today - timedelta(days=retention_days)
    dropped: list[str] = []
    base = Path(root)
    if not base.exists():
        return dropped
    for child in sorted(base.iterdir()):
        m = _DT_DIR.match(child.name)
        if m and date.fromisoformat(m.group(1)) < cutoff:
            shutil.rmtree(child)
            dropped.append(child.name)
    return dropped


def compact_partition(
    spark,
    path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a table/partition into ~target-sized
    files; returns the resulting file count.

    The landing pattern (K2 append sinks, streaming micro-batches) accretes
    many small parquet files; scan cost then becomes file-open-bound. This
    rewrites with ``coalesce`` (no shuffle — pure task merging) through the
    same staging-swap discipline as the merge, so readers never see a
    partial table. Run it from the maintenance window like retention.
    """
    import shutil as _shutil

    df = spark.read.parquet(path)
    total = sum(f.stat().st_size for f in Path(path).rglob("*.parquet"))
    n = max(1, int(total / target_bytes_per_file) + (1 if total % target_bytes_per_file else 0))
    staging = Path(path + ".__compact__")
    if staging.exists():
        _shutil.rmtree(staging)
    df.coalesce(n).write.mode("overwrite").parquet(str(staging))
    backup = Path(path + ".__old__")
    Path(path).rename(backup)
    staging.rename(path)
    _shutil.rmtree(backup)
    return n


def keep_only_latest(root: str) -> list[str]:
    """K8 (raw-zone rule): keep only the newest ``dt=`` partition
    (cleanup_old_data.py keeps only today's raw folder)."""
    base = Path(root)
    if not base.exists():
        return []
    parts = sorted(p for p in base.iterdir() if _DT_DIR.match(p.name))
    dropped = []
    for child in parts[:-1]:
        shutil.rmtree(child)
        dropped.append(child.name)
    return dropped
