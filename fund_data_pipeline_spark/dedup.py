"""Deterministic keyed deduplication (SURVEY §2.5, D1-D6).

The reference's pandas ``drop_duplicates(keep='first'|'last')`` depends on
file-read order — nondeterministic in a distributed engine. Every dedup here
takes an explicit tiebreak ordering, implemented as a ``row_number`` window
(one shuffle on the key, no global sort — scales to arbitrary key cardinality).

Parity targets:
- D1 keep-first on (ticker, asset_type): 01_master_sync/00_master_list_cleaner.py:76-77
- D2 keep-last on NAV natural key (last file read wins):
  02_performance_sync/00_performance_data_cleaner.py:110
- D3 sort-then-dedup consolidation: 01_master_sync/01_source_consolidator.py:76-79
- D4 dedup by row_hash: scripts/bulk_import_from_hashed.py:56,109
- D5 natural-key dedup before load: 03_holdings_loader.py:77-79 etc.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keyed(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    keep: str = "first",
) -> DataFrame:
    """Keep exactly one row per ``keys``, picked by ``order_by``.

    ``keep='first'`` keeps the row that sorts first under ``order_by``;
    ``keep='last'`` keeps the one that sorts last (D2's keep-last with an
    explicit tiebreaker instead of pandas read order).
    """
    if not order_by:
        raise ValueError("order_by must be non-empty for deterministic dedup")
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    # internal-column clash guard, same contract as merge_upsert/diff_frames:
    # silently overwriting a real __rn/__cnt column would filter user rows on
    # the replacement and then drop the user's column without any error
    clash = {"__rn", "__cnt"} & set(df.columns)
    if clash:
        raise ValueError(f"column names reserved by dedup_keyed: {sorted(clash)}")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    pk = [F.col(k) for k in keys]
    if keep == "last" and all(isinstance(c, str) for c in order_by):
        # fast path (the merge engine's): reverse the ordering, take row 1
        w = Window.partitionBy(*pk).orderBy(*[F.col(c).desc() for c in order_by])
        pred = F.col("__rn") == 1
        out = df.withColumn("__rn", F.row_number().over(w))
    elif keep == "last":
        # Column entries may already BE sort orders (F.col('x').desc());
        # calling .desc() on one nests SortOrder(SortOrder(..)) and fails
        # analysis. Keep the caller's ordering untouched and take the LAST
        # row instead: rn == partition count. Same exchange + sort; the
        # count runs as a second window pass over the sorted partition.
        w = Window.partitionBy(*pk).orderBy(*cols)
        out = df.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy(*pk))
        )
        pred = F.col("__rn") == F.col("__cnt")
    else:
        w = Window.partitionBy(*pk).orderBy(*cols)
        pred = F.col("__rn") == 1
        out = df.withColumn("__rn", F.row_number().over(w))
    return out.filter(pred).drop("__rn", "__cnt")


def dedup_any(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D1/D4/D5 as the reference behaves when order is irrelevant: one
    arbitrary row per key (Spark's ``dropDuplicates`` — no window, cheaper
    map-side partial aggregation). Use :func:`dedup_keyed` when the surviving
    row matters, or :func:`dedup_min` for a deterministic survivor at the
    same aggregation cost — ``dedup_any`` is only safe when rows are
    identical per key (e.g. the key covers every value column)."""
    return df.dropDuplicates(list(keys))


def dedup_min(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D5 with a DETERMINISTIC survivor at ``dropDuplicates`` cost.

    Keeps, per key, the row whose non-key column tuple sorts first
    (``min`` over a struct — partial+final hash aggregate, map-side
    combine, no window sort). ``dropDuplicates`` keeps an ARBITRARY row:
    two runs over the same input can pick different survivors, which flips
    non-key values, changes the all-columns row hash, and re-fires the
    hash-guarded merge on a rerun that should be a no-op (review r11 —
    the dividend/holdings load paths hit exactly this, because their
    natural keys don't cover every value column)."""
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.dropDuplicates(list(keys))  # rows are identical per key
    if "__s" in df.columns:
        raise ValueError("column name reserved by dedup_min: '__s'")
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.min(F.struct(*[F.col(c) for c in others])).alias("__s")
    )
    # restore the caller's column order (downstream all-columns hashing is
    # column-order-sensitive); getField, not F.col("__s.<name>") — a dotted
    # column name would mis-parse as a nested path (review r11)
    sel = [
        F.col(c) if c in keys else F.col("__s").getField(c).alias(c)
        for c in df.columns
    ]
    return agg.select(*sel)


def duplicate_stats(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """A4: how many rows each key contributes beyond the first (dup metric)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
        .withColumn("n_duplicates", F.col("n_rows") - 1)
    )
