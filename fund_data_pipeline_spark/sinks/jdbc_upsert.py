"""Hash-guarded relational upsert sink (K3-K5 over a database, not parquet).

The reference's actual load path is a Postgres upsert
(src/utils/db_connector.py:380-419): pandas ``to_sql`` with a custom method
that emits ``INSERT ... ON CONFLICT ON CONSTRAINT <uq> DO UPDATE SET <all
cols except id/updated_at> WHERE target.row_hash IS DISTINCT FROM
excluded.row_hash``, chunked 1000 rows. The engine's primary rebuild of
those semantics is the parquet merge (``merge.merge_upsert`` — same MERGE
decision table, no database needed); this module completes the story for
deployments that DO load into a warehouse:

- :func:`upsert_sql` generates the reference's statement for a dialect —
  a pure function, unit-tested without any server.
- :func:`write_upsert` executes it from the executors via
  ``foreachPartition``: each partition opens its own connection (drivers
  are not picklable — the factory callable is shipped, not the connection)
  and runs batched ``executemany``. This is the standard Spark pattern for
  upsert sinks (``df.write.jdbc`` only supports append/overwrite).

Scale notes (100 TB): per-partition connections mean the write parallelism
equals the DataFrame's partition count — ``repartition(n)`` to match the
database's connection budget; batches bound memory; the hash guard turns
re-runs into no-ops server-side, so the sink is idempotent like the parquet
merge. No database driver ships in this container — tests exercise the
executor path with sqlite3 (stdlib DBAPI) and the SQL generator for the
postgres dialect.
"""

from __future__ import annotations

import itertools
import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

#: columns the reference never updates on conflict (db_connector.py:402)
DEFAULT_SKIP_UPDATE = ("id", "updated_at")

#: The reference's staging-table -> unique-constraint map
#: (db_connector.py:384-394): its upsert targets the NAMED constraint
#: (``ON CONFLICT ON CONSTRAINT uq_...``), not a column list. Pass
#: ``constraint=REFERENCE_CONSTRAINTS[table]`` to emit the byte-identical
#: conflict target a reference deployment's schema expects.
REFERENCE_CONSTRAINTS = {
    "stg_security_master": "uq_stg_master_key",
    "stg_price_history": "uq_stg_price_key",
    "stg_daily_nav": "uq_stg_daily_nav_key",
    "stg_dividend_history": "uq_stg_dividend_key",
    "stg_allocations": "uq_stg_allocations_key",
    "stg_fund_info": "uq_stg_fund_info_key",
    "stg_fund_fees": "uq_stg_fund_fees_key",
    "stg_fund_risk": "uq_stg_fund_risk_key",
    "stg_fund_policy": "uq_stg_fund_policy_key",
    "stg_fund_holdings": "uq_stg_holdings_key",
}

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_identifiers(table: str, names: Sequence[str]) -> None:
    """Identifiers are interpolated unquoted into the statement, so anything
    that would need quoting (mixed case folds differently per dialect,
    reserved words, punctuation) — or that arrives from untrusted metadata —
    is rejected rather than emitted into SQL."""
    # allow schema-qualified tables: each dot-separated part must be clean
    bad = [p for p in table.split(".") if not _IDENT.match(p)]
    bad += [n for n in names if not _IDENT.match(n)]
    if bad:
        raise ValueError(
            f"identifiers not safe to interpolate unquoted: {bad!r}; "
            f"rename to ^[A-Za-z_][A-Za-z0-9_]*$"
        )


def upsert_sql(
    table: str,
    columns: Sequence[str],
    keys: Sequence[str],
    hash_col: str | None = "row_hash",
    skip_update: Sequence[str] = DEFAULT_SKIP_UPDATE,
    dialect: str = "postgresql",
    constraint: str | None = None,
) -> str:
    """The reference's ON CONFLICT statement for ``dialect``, parameterized
    in the dialect's native DBAPI paramstyle: ``%s`` (format) for
    postgresql — what psycopg2/psycopg3/pg8000 actually accept — and ``?``
    (qmark) for sqlite.

    ``hash_col=None`` drops the guard (the reference's stg_daily_nav path,
    which has no row_hash — SURVEY §1.4); otherwise the UPDATE fires only
    when the stored hash differs (null-safe inequality per dialect).

    ``constraint``: emit the reference's exact conflict target — ``ON
    CONFLICT ON CONSTRAINT <name>`` (db_connector.py:405, via the
    :data:`REFERENCE_CONSTRAINTS` map) — instead of the column-list form.
    Postgres only; sqlite has no named-constraint conflict target.
    """
    cols = list(columns)
    keys = list(keys)
    if not keys:
        # an empty conflict target renders as "ON CONFLICT ()" — a SQL
        # syntax error surfaced per-partition at executemany time, and in
        # write_upsert a keyless repartition() TypeError before that;
        # fail at statement-build time with the actual cause (review r13)
        raise ValueError("keys must name at least one conflict column")
    if hash_col is not None and hash_col in set(skip_update) and hash_col not in keys:
        # the guard compares target.<hash> to excluded.<hash>, but the
        # UPDATE would never refresh the stored hash — every rerun fires
        # the update again, silently defeating the idempotence the guard
        # exists for (review r13)
        raise ValueError(
            f"hash_col {hash_col!r} is in skip_update: the stored hash would "
            "never refresh, so the hash guard cannot make reruns no-ops"
        )
    _check_identifiers(
        table,
        cols + keys + ([hash_col] if hash_col else []) + ([constraint] if constraint else []),
    )
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"keys {missing} not in columns {cols}")
    if constraint is not None and dialect != "postgresql":
        raise ValueError("ON CONFLICT ON CONSTRAINT is postgres-only; use keys for sqlite")
    set_cols = [c for c in cols if c not in keys and c not in set(skip_update)]
    if not set_cols:
        raise ValueError("no updatable columns: everything is a key or skipped")
    if dialect == "postgresql":
        distinct = f"{table}.{hash_col} IS DISTINCT FROM excluded.{hash_col}"
        placeholder = "%s"
    elif dialect == "sqlite":
        distinct = f"{table}.{hash_col} IS NOT excluded.{hash_col}"
        placeholder = "?"
    else:
        raise ValueError(f"unknown dialect {dialect!r}; use 'postgresql' or 'sqlite'")
    target = (
        f"ON CONSTRAINT {constraint}" if constraint is not None else f"({', '.join(keys)})"
    )
    sql = (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"VALUES ({', '.join(placeholder for _ in cols)}) "
        f"ON CONFLICT {target} DO UPDATE SET "
        + ", ".join(f"{c} = excluded.{c}" for c in set_cols)
    )
    if hash_col is not None:
        if hash_col not in cols:
            raise ValueError(f"hash_col {hash_col!r} not in columns")
        sql += f" WHERE {distinct}"
    return sql


def write_upsert(
    df: DataFrame,
    connection_factory: Callable[[], object],
    table: str,
    keys: Sequence[str],
    hash_col: str | None = "row_hash",
    skip_update: Sequence[str] = DEFAULT_SKIP_UPDATE,
    dialect: str = "postgresql",
    batch_size: int = 1000,
    constraint: str | None = None,
    dedupe_order: Sequence = (),
    num_partitions: int | None = None,
) -> None:
    """Upsert ``df`` into ``table`` through per-partition DBAPI connections.

    Duplicate-key discipline (review r10): rows are repartitioned ON the
    natural key and sorted by it within each partition, so (a) every
    occurrence of a key lands in ONE partition/transaction — two
    transactions can never update the same key, and (b) all transactions
    acquire row locks in the same global key order, which removes the
    lock-cycle deadlock a hash-partitioned executemany can hit when
    different partitions update overlapping key sets in different orders.
    Pass ``dedupe_order`` (sort columns, e.g. ``['scrape_date']``) to
    collapse same-key duplicates deterministically first via
    ``dedup_keyed(keep='last')`` — the same discipline the parquet merge
    applies internally; without it, same-key rows hit ON CONFLICT in key
    order but their RELATIVE order (hence the surviving value) is
    undefined, so inputs with duplicate keys REQUIRE it for reproducible
    reruns.

    ``connection_factory`` is called once per partition ON THE EXECUTOR and
    must return a DBAPI connection (e.g. ``lambda: psycopg2.connect(dsn)``);
    it is shipped by pickle, so close over connection strings, not live
    handles. Rows go in ``executemany`` batches of ``batch_size`` (the
    reference's chunksize=1000), one commit per partition.

    ``constraint``: postgres-only — emit ``ON CONFLICT ON CONSTRAINT <name>``
    instead of the column-list conflict target (the reference targets its
    staging constraints BY NAME, db_connector.py:380-419; see
    ``REFERENCE_CONSTRAINTS``). Without it, a deployment whose unique
    constraint differs from ``keys`` fails at runtime on every partition
    (review r9: this form was previously reachable only via
    :func:`upsert_sql`, never from the executor sink).

    ``num_partitions``: bounds the write fan-out — a bare keyed
    ``repartition`` scatters to ``spark.sql.shuffle.partitions`` (often
    200+), i.e. 200+ concurrent DB connections for any input size (advice
    r10). When unset, the partition count is left to AQE coalescing, and
    empty partitions are detected BEFORE ``connection_factory`` is called
    so they cost nothing either way.
    """
    if dedupe_order:
        from ..dedup import dedup_keyed

        df = dedup_keyed(df, list(keys), list(dedupe_order), keep="last")
    from pyspark.sql import functions as F

    key_cols = [F.col(k) for k in keys]
    if num_partitions is not None:
        df = df.repartition(num_partitions, *key_cols)
    else:
        df = df.repartition(*key_cols)
    df = df.sortWithinPartitions(*keys)
    cols = list(df.columns)
    sql = upsert_sql(table, cols, keys, hash_col, skip_update, dialect, constraint=constraint)

    def write_partition(rows) -> None:
        # Peek before opening a connection: with shuffle.partitions >> |keys|
        # most partitions are empty, and an empty partition must not cost a
        # DB round-trip (advice r10).
        rows = iter(rows)
        first = next(rows, None)
        if first is None:
            return
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []
            for row in itertools.chain([first], rows):
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    batch.clear()
            if batch:
                cur.executemany(sql, batch)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)
