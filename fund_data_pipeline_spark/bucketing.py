"""Bucketed staging tables: shuffle-free keyed merges and joins.

At 100 TB the keyed merge's dominant cost is shuffling the TARGET table on
the natural key every run. Bucketing removes it: write the table
``bucketBy(n, keys)`` via ``saveAsTable`` and Spark records the hash
layout in the catalog; any subsequent equi-join or merge on those keys
reads the buckets directly — no Exchange on the bucketed side, ever
(SURVEY §1.4: "partition/Z-order by ticker"; §7's co-located join plan).

The daily flow becomes:
    batch (small)  --one shuffle into n buckets-->  join  <--no shuffle--  target
so merge cost is O(batch) + O(target scan), not O(target shuffle).

``tests/test_plans.py::test_bucketed_join_has_no_exchange`` freezes the
no-Exchange property against the physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    n_buckets: int = DEFAULT_BUCKETS,
    sort_within: bool = True,
) -> None:
    """Create/replace a bucketed managed table laid out for keyed access.

    ``sort_within`` additionally sorts each bucket file by the key, letting
    joins run as sort-merge without a sort stage and giving parquet min/max
    pruning a monotone key column.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_within:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same keys/bucket-count: no Exchange
    on either side (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), list(keys), how)


def bucketed_merge(
    spark: SparkSession,
    target_table: str,
    out_table: str,
    source: DataFrame,
    keys: Sequence[str],
    hash_col: str = "row_hash",
    n_buckets: int = DEFAULT_BUCKETS,
    preserve_cols: Sequence[str] = (),
) -> DataFrame:
    """Hash-guarded MERGE against a bucketed target with NO target-side
    shuffle — the 100 TB daily-merge shape.

    The full-outer join reuses the target's bucket layout (plain-equality
    keys: a natural-key table has non-null keys by construction, and
    null-safe equality would block bucket-scan reuse), so the ONLY Exchange
    in the plan is the O(batch) shuffle of the source into the bucket hash.
    The merged relation is written to ``out_table`` with the same bucketing
    and returned; readers flip to it via a view/manifest pointer — a catalog
    table cannot be overwritten while it is being read, and the metadata
    flip keeps the swap atomic.

    ``tests/test_plans.py::test_bucketed_merge_shuffles_batch_only`` freezes
    the single-Exchange property.
    """
    from .merge import merge_as_dataframe

    # overwriting the table the merge plan is reading would either throw
    # mid-write or corrupt, depending on format internals — refuse up
    # front with the actual contract (write to a NEW table, flip readers
    # via view/manifest) instead (review r12). Names are database-qualified
    # before comparing (ADVICE r12): 'default.t' vs 't' under the default
    # database is the SAME relation, which a raw string compare let through.
    def _qualified(name: str) -> tuple[str, ...]:
        parts = [p.strip().lower() for p in name.strip().split(".")]
        if len(parts) == 1:
            parts = [spark.catalog.currentDatabase().lower(), *parts]
        # a 3-part (catalog-qualified) spelling keeps its catalog; a 2-part
        # one compares on (database, table) — cross-catalog same-named
        # tables therefore match conservatively, and the guard refuses
        # (false-refusal is safe; false-pass corrupts the relation being
        # read)
        return tuple(parts[-2:])

    if _qualified(out_table) == _qualified(target_table):
        raise ValueError(
            "bucketed_merge writes a NEW table and flips readers to it; "
            f"out_table must differ from target_table ({target_table!r})"
        )
    target = spark.table(target_table)
    merged = merge_as_dataframe(
        target,
        source,
        keys,
        hash_col=hash_col,
        preserve_cols=preserve_cols,
        null_safe_keys=False,
    )
    write_bucketed(merged, out_table, keys, n_buckets=n_buckets)
    return spark.table(out_table)
