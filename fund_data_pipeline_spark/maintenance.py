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


def _heal_dotted_backup(p: Path) -> None:
    """Entry heal for the dot-prefixed in-hive-root swap (snapshot/compact):
    a ``.{name}.__old__`` sibling with no live dir means the previous swap
    crashed between its renames — the backup IS the table; restore it. A
    backup alongside a live dir is a post-swap leftover; discard it."""
    backup = p.with_name("." + p.name + ".__old__")
    if backup.exists() and not p.exists():
        backup.rename(p)
    elif backup.exists():
        shutil.rmtree(backup)


def snapshot(df, root: str, dt: str) -> None:
    """K6/K7: write an immutable dated snapshot partition.

    Staged-then-swap like every other destructive write (review r9: this
    was the one naive overwrite left — Spark's overwrite deletes the
    existing partition BEFORE the job commits, so a crashed re-run would
    destroy the previous good snapshot and could leave an empty directory
    that reads as a valid empty partition). Staging/backup siblings are
    dot-prefixed because they live inside a hive root, where a visible
    ``dt=...__snap__`` sibling would be parsed as a real partition; the
    partition dir name goes through :func:`merge.hive_partition_dir` so an
    escaped-charset ``dt`` lands where partition discovery will read it."""
    from .merge import hive_partition_dir

    p = Path(root) / hive_partition_dir("dt", dt)
    p.parent.mkdir(parents=True, exist_ok=True)
    backup = p.with_name("." + p.name + ".__old__")
    staging = p.with_name("." + p.name + ".__snap__")
    _heal_dotted_backup(p)
    if staging.exists():
        shutil.rmtree(staging)
    df.write.mode("overwrite").parquet(str(staging))
    if p.exists():
        p.rename(backup)
    staging.rename(p)
    if backup.exists():
        shutil.rmtree(backup)


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
    """Small-file compaction: rewrite a leaf table/partition directory into
    ~target-sized files; returns the resulting file count.

    The landing pattern (K2 append sinks, streaming micro-batches) accretes
    many small parquet files; scan cost then becomes file-open-bound. This
    rewrites with ``coalesce`` (no shuffle — pure task merging) through a
    staging-then-swap. The swap is two renames, NOT atomic: a reader racing
    the swap can briefly see a missing directory, and a crash between the
    renames leaves only the ``.__old__`` backup. Both are handled for the
    *writer*: on entry a stale backup with no live table is restored, and a
    stale backup alongside a live table is discarded — so a crashed or
    interrupted compaction is always safe to retry.

    Must be pointed at a LEAF directory. Compacting a hive-partitioned root
    would inline the ``dt=...`` partition values as data columns and flatten
    the layout (breaking pruning and the retention ops above), so that case
    is refused.
    """
    import shutil as _shutil

    p = Path(path)
    # backup/staging are dot-prefixed: a compacted leaf often sits inside a
    # hive root, where a visible 'dt=...__old__'/'...__compact__' sibling
    # would be parsed by partition discovery as a real partition (corrupt
    # reads of in-flight staging data or of the crash leftover)
    backup = p.with_name("." + p.name + ".__old__")
    _heal_dotted_backup(p)
    if not p.exists():
        raise FileNotFoundError(
            f"compact_partition target does not exist and no crash backup was "
            f"found to restore: {path} (mistyped path, or the partition was "
            f"dropped by retention?)"
        )
    if any(child.is_dir() and "=" in child.name for child in p.iterdir()):
        raise ValueError(
            f"compact_partition must target a leaf partition directory, not a "
            f"hive-partitioned root: {path} (compact each dt= child instead)"
        )

    # mergeSchema: the one caller that DESTROYS its input must not sample a
    # single footer — an append/streaming leaf legitimately accretes files
    # of different widths (the exact case this compactor exists for), and a
    # narrow-footer sample would silently drop the evolved column from the
    # rewrite before the originals are rmtree'd (review r9; read_table
    # auto-merges for the same reason, merge.py read path likewise)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    total = sum(f.stat().st_size for f in p.rglob("*.parquet"))
    n = max(1, -(-total // target_bytes_per_file))  # exact ceil-div (no float)
    staging = p.with_name("." + p.name + ".__compact__")
    if staging.exists():
        _shutil.rmtree(staging)
    df.coalesce(n).write.mode("overwrite").parquet(str(staging))
    p.rename(backup)
    staging.rename(p)
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


def vacuum_snapshots(table_path: str, keep_last: int | None = None) -> list[str]:
    """GC orphan snapshot directories of a manifest-layout merge table.

    ``merge.merge_upsert(layout="manifest")`` prunes the superseded snapshot
    as part of each successful swap, but a write that crashes between the
    snapshot write and the manifest repoint leaves an orphan ``_v_NNNNN``
    directory the pointer never referenced. This removes snapshots with a
    version STRICTLY BELOW the live pointer's and returns the deleted
    names.

    ``keep_last``: how many trailing versions (live included) to leave on
    disk. The default ``None`` honors the retention the table itself
    persists in its manifest pointer (``retention=N``; 1 when undeclared),
    so a janitor pass never collects the time-travel window
    (``merge.read_table(version=...)`` / ``merge.table_changes``).

    The below-live rule is what makes the janitor safe against a CONCURRENT
    writer: a writer only ever creates versions above the current pointer,
    so a snapshot it is mid-writing (or has just repointed to) can never be
    selected for deletion here. A crash orphan left at a version >= live is
    skipped this pass and becomes collectable once the table advances past
    it. On an object store, additionally run the janitor AFTER the
    read-grace period — an in-flight reader may still be scanning a
    directory the pointer abandoned moments ago.
    """
    from .merge import MANIFEST_NAME, _persisted_retention

    path = Path(table_path)
    mf = path / MANIFEST_NAME
    if not mf.exists():
        return []
    if keep_last is None:
        keep_last = _persisted_retention(path) or 1
    # a zero-byte manifest (crash mid-create) parses as no live version
    live = (mf.read_text().splitlines() or [""])[0].strip()
    try:
        live_version = int(live.rsplit("_", 1)[-1])
    except ValueError:
        return []
    removed = []
    for snap in sorted(path.glob("_v_*")):
        try:
            version = int(snap.name.rsplit("_", 1)[-1])
        except ValueError:
            continue
        if snap.is_dir() and version <= live_version - max(1, keep_last):
            # A concurrent writer prunes the snapshot it just superseded
            # (_manifest_write); if both it and this janitor reach the same
            # directory, one rmtree loses the race mid-walk. Either way the
            # directory ends up gone, so a vanished path is success, not
            # failure — but only count it as removed if this process did it.
            try:
                shutil.rmtree(snap)
            except FileNotFoundError:
                continue
            removed.append(snap.name)
    return removed


def write_range_clustered(
    df,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    target_rows_per_file: int = 5_000_000,
) -> None:
    """Write a table range-clustered on ``cluster_cols``: rows are
    range-partitioned across files and sorted within each file, so every
    parquet file (and row group) covers a narrow, non-overlapping slice of
    the cluster key's value space.

    This is the storage-layout half of predicate pushdown: a filter on the
    cluster column then skips whole files/row groups from the parquet
    min/max statistics instead of scanning and discarding. At 100 TB,
    clustering the big fact tables on their dominant filter column (ship
    date, event time) turns most time-range queries into reads of a few
    percent of the files. The reference's per-day CSV directories are the
    folk version of this; range clustering gives the same pruning inside
    one table without a partition-per-day directory explosion.

    ``n_files`` defaults to rows/target_rows_per_file (one extra count job
    when not supplied — pass it from table stats in production).
    """
    from pyspark.sql import functions as F  # noqa: F811 (local, matches module style)

    if n_files is None:
        n_files = max(1, -(-df.count() // target_rows_per_file))  # ceil
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def delete_keys(
    spark,
    table_path: str,
    keys_df,
    key_cols: list[str],
    *,
    partition_col: str | None = None,
    history: int | None = None,
) -> int:
    """Keyed hard delete (GDPR erasure / blocklist purge): remove every row
    whose ``key_cols`` tuple appears in ``keys_df``; returns the number of
    rows removed.

    Copy-on-write with partition pruning — the same strategy Delta/Iceberg
    use for COW deletes: one column-pruned scan (key + partition columns
    only) finds which partitions contain victims, then ONLY those
    partitions are rewritten via anti-join and swapped in
    (:func:`~fund_data_pipeline_spark.merge._partition_swap_write`); every
    other partition's files stay byte-identical. A partition left empty is
    dropped entirely. At 100 TB an erasure request touches the handful of
    partitions the subject's rows live in, not the table.

    ``keys_df`` is broadcast (erasure batches are small — thousands of
    subjects, not billions); for a huge key set drop the hint and let AQE
    pick the join side.

    Works on every merge layout: hive-partitioned (pass ``partition_col``),
    plain directories, and manifest tables — a manifest table's live
    snapshot is resolved through ``merge.read_table`` (a naive
    ``spark.read.parquet`` would list zero files: snapshot dirs are
    underscore-prefixed) and the delete is published as a NEW snapshot
    version, preserving the pointer-swap atomicity. ``history=None``
    (default) preserves the retention persisted in the table's manifest
    pointer, so an erasure cannot silently prune a time-travel window
    established by earlier merges; an explicit int sets and persists a new
    retention.
    """
    from pyspark.sql import functions as F

    from .merge import (
        _atomic_write,
        _check_layout_compatible,
        _manifest_write,
        detect_layout,
        read_table,
        swap_partitions_dropping_absent,
        touched_partition_filter,
    )

    path = Path(table_path)
    layout = detect_layout(path)
    if layout == "manifest" and partition_col is not None:
        raise ValueError("manifest tables are unpartitioned; drop partition_col")
    # a mismatched write shape corrupts silently (flat rewrite of a hive
    # root, partition swap into a flat root) — refuse loudly instead
    intended = (
        "hive"
        if partition_col
        else ("manifest" if layout == "manifest" else "flat")
    )
    _check_layout_compatible(path, intended)
    # heal orphaned swap backups BEFORE reading (review r11, same as
    # merge_upsert): a crash between a previous swap's renames leaves only
    # the backup — reading past it would see a missing table/partition and
    # delete against the wrong state
    if layout != "manifest":
        from .merge import _heal_partition_backups, heal_backup_swap

        heal_backup_swap(path)
        if partition_col is not None:
            _heal_partition_backups(path, partition_col)
    keys_df = keys_df.select(*key_cols).dropDuplicates(key_cols)
    df = read_table(spark, table_path)
    if partition_col is None:
        n_deleted = df.join(F.broadcast(keys_df), key_cols, "left_semi").count()
        if n_deleted == 0:
            return 0
        survivors = df.join(F.broadcast(keys_df), key_cols, "left_anti")
        if layout == "manifest":
            _manifest_write(survivors, path, history=history)
        else:
            _atomic_write(survivors, path)
        return n_deleted

    # ONE column-pruned discovery scan yields both the victim count and the
    # partitions holding victims (a NULL partition value groups under None
    # and is rewritten like any other — plain isin would silently skip it)
    victim_stats = (
        df.join(F.broadcast(keys_df), key_cols, "left_semi")
        .groupBy(partition_col)
        .count()
        .collect()
    )
    n_deleted = sum(r["count"] for r in victim_stats)
    if n_deleted == 0:
        return 0
    touched = [r[partition_col] for r in victim_stats]
    from .merge import _ISIN_PRUNE_MAX

    if len(touched) <= _ISIN_PRUNE_MAX:
        pruned = df.filter(touched_partition_filter(partition_col, touched))
    else:
        # a subject spread over thousands of partitions would bloat the
        # plan with a giant literal list — switch to a broadcast semi-join
        # prune on the partition value (null-safe), mirroring the merge's
        # backfill path. The touched list itself stays driver-side only
        # for the stale-directory sweep (O(#touched) local fs ops).
        probe = F.broadcast(
            spark.createDataFrame(
                [(v,) for v in touched], f"__touched_part {dict(df.dtypes)[partition_col]}"
            )
        )
        pruned = df.join(
            probe,
            df[partition_col].eqNullSafe(probe["__touched_part"]),
            "left_semi",
        )
    survivors = pruned.join(F.broadcast(keys_df), key_cols, "left_anti")
    swap_partitions_dropping_absent(survivors, path, partition_col, touched)
    return n_deleted


def write_zorder_clustered(
    df,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits_per_col: int = 16,
) -> None:
    """Write a table clustered on a Z-order (Morton) curve over
    ``cluster_cols``: each row's cluster columns are bucketed to
    ``bits_per_col``-bit integers, the bits are interleaved into one
    Z-value, and rows are range-partitioned + sorted by it.

    :func:`write_range_clustered` gives perfect file skipping on ONE
    column (lexicographic sort gives later columns no pruning power);
    Z-ordering trades a little per-column precision for locality in EVERY
    cluster dimension — a filter on any single one of the cluster columns
    skips most files from footer min/max stats. This is the same layout
    Delta's OPTIMIZE ZORDER BY uses, built from plain expressions: bucket
    via ``width_bucket`` against global min/max (one cheap agg job), then
    interleave bits with shift/AND arithmetic — all JVM-side, no UDF.

    Uniform-width bucketing keeps the Z-value a pure per-row expression;
    heavily skewed columns would prefer rank-based bucketing (quantile
    boundaries from ``approxQuantile`` swapped into the same expression).
    At 100 TB: one stats pass + one range shuffle, identical cost shape to
    the single-column clustered write.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local, matches module style)

    if not 1 <= bits_per_col * len(cluster_cols) <= 63:
        raise ValueError("bits_per_col * len(cluster_cols) must fit a signed long")

    def numeric(c: str):
        # temporal columns cluster on their epoch value (DATE/TIMESTAMP have
        # no direct double cast); strings have no meaningful linear order
        # for width_bucket — reject them rather than cluster on garbage
        dtype = dict(df.dtypes)[c]
        if dtype == "date":
            return F.unix_date(F.col(c)).cast("double")
        if dtype.startswith("timestamp"):
            return F.unix_timestamp(F.col(c)).cast("double")
        if dtype in ("string", "binary"):
            raise ValueError(
                f"z-order needs an ordered numeric/temporal column; {c!r} is "
                f"{dtype} — cluster on a derived numeric key instead"
            )
        return F.col(c).cast("double")

    num_cols = {c: numeric(c) for c in cluster_cols}
    stats = df.agg(
        *[F.min(num_cols[c]).alias(f"__min_{c}") for c in cluster_cols],
        *[F.max(num_cols[c]).alias(f"__max_{c}") for c in cluster_cols],
    ).first()
    n_buckets = 1 << bits_per_col
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cluster_cols):
        lo, hi = stats[f"__min_{c}"], stats[f"__max_{c}"]
        if lo is None or hi == lo:
            bucket = F.lit(0).cast("long")  # constant/empty column: no bits
        else:
            # width_bucket returns 1..n+1; clamp into 0..n_buckets-1
            bucket = (
                F.least(
                    F.greatest(
                        F.width_bucket(
                            num_cols[c],
                            F.lit(float(lo)),
                            F.lit(float(hi)),
                            F.lit(n_buckets),
                        ),
                        F.lit(1),
                    ),
                    F.lit(n_buckets),
                )
                - 1
            ).cast("long")
        # interleave: bit j of this column lands at position j*n_cols + ci
        for j in range(bits_per_col):
            z = z + F.shiftleft(
                F.shiftright(bucket, j).bitwiseAND(F.lit(1)),
                j * len(cluster_cols) + ci,
            )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
