"""Tests for the relational upsert sink (sinks.jdbc_upsert).

No database server ships in this container, so the executor path runs
against file-backed sqlite3 (stdlib DBAPI, real ON CONFLICT semantics) and
the postgres dialect is covered at the SQL-generation level.
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from fund_data_pipeline_spark.sinks.jdbc_upsert import upsert_sql, write_upsert


def test_upsert_sql_postgres_matches_reference_shape():
    sql = upsert_sql(
        "stg_daily_nav",
        ["ticker", "as_of_date", "nav_price", "updated_at", "row_hash"],
        keys=["ticker", "as_of_date"],
    )
    assert sql == (
        "INSERT INTO stg_daily_nav (ticker, as_of_date, nav_price, updated_at, row_hash) "
        "VALUES (%s, %s, %s, %s, %s) "
        "ON CONFLICT (ticker, as_of_date) DO UPDATE SET "
        "nav_price = excluded.nav_price, row_hash = excluded.row_hash "
        "WHERE stg_daily_nav.row_hash IS DISTINCT FROM excluded.row_hash"
    )
    # updated_at is excluded from SET (reference skips id/updated_at on update)
    assert "updated_at = excluded" not in sql


def test_upsert_sql_no_hash_guard():
    sql = upsert_sql("t", ["k", "v"], keys=["k"], hash_col=None)
    assert sql.endswith("DO UPDATE SET v = excluded.v")
    assert "WHERE" not in sql


def test_upsert_sql_rejects_bad_specs():
    with pytest.raises(ValueError):
        upsert_sql("t", ["a", "b"], keys=["missing"])
    with pytest.raises(ValueError):
        upsert_sql("t", ["k", "updated_at"], keys=["k"])  # nothing updatable
    with pytest.raises(ValueError):
        upsert_sql("t", ["k", "v"], keys=["k"], dialect="oracle")
    # empty keys would render "ON CONFLICT ()" — a syntax error deferred to
    # every partition's executemany; fail at build time instead (review r13)
    with pytest.raises(ValueError, match="at least one conflict column"):
        upsert_sql("t", ["k", "v"], keys=[])
    # a skipped hash column never refreshes server-side, so the guard fires
    # the UPDATE on every rerun — the opposite of its purpose (review r13)
    with pytest.raises(ValueError, match="hash guard"):
        upsert_sql(
            "t",
            ["k", "v", "row_hash"],
            keys=["k"],
            skip_update=("id", "updated_at", "row_hash"),
        )


def test_write_upsert_executor_path_sqlite(spark, tmp_path):
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE nav (ticker TEXT, price REAL, row_hash TEXT,"
            " PRIMARY KEY (ticker))"
        )

    def feed(rows):
        df = spark.createDataFrame(rows, "ticker string, price double, row_hash string")
        # single partition: sqlite allows one writer at a time; a real
        # warehouse sink sizes partitions to the connection budget instead
        write_upsert(
            df.coalesce(1),
            lambda: sqlite3.connect(db),
            "nav",
            keys=["ticker"],
            dialect="sqlite",
            batch_size=2,
        )

    feed([("AAA", 1.0, "h1"), ("BBB", 2.0, "h2"), ("CCC", 3.0, "h3")])
    feed([("BBB", 9.0, "h9"), ("DDD", 4.0, "h4")])  # update + insert

    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT ticker, price FROM nav").fetchall())
    assert got == {"AAA": 1.0, "BBB": 9.0, "CCC": 3.0, "DDD": 4.0}

    # hash-guard SKIP: same row_hash with a different payload must leave the
    # stored row untouched (the WHERE <hash> IS NOT excluded.<hash> guard
    # fires server-side) — the property that makes re-runs no-ops
    feed([("AAA", 111.0, "h1")])
    with sqlite3.connect(db) as conn:
        (price,) = conn.execute("SELECT price FROM nav WHERE ticker='AAA'").fetchone()
    assert price == 1.0


def test_write_upsert_multi_partition_connections(spark, tmp_path):
    """Each partition opens its own connection on the executor; with a
    busy-timeout factory the partitions serialize on sqlite's single-writer
    lock and every row still lands exactly once."""
    db = str(tmp_path / "mp.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE t (k INTEGER, v TEXT, row_hash TEXT, UNIQUE(k))")

    rows = [(i, f"v{i}", f"h{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v string, row_hash string").repartition(4)
    write_upsert(
        df,
        lambda: sqlite3.connect(db, timeout=30),
        "t",
        keys=["k"],
        dialect="sqlite",
        batch_size=7,
    )
    # idempotent re-run: identical hashes -> zero server-side changes
    write_upsert(
        df,
        lambda: sqlite3.connect(db, timeout=30),
        "t",
        keys=["k"],
        dialect="sqlite",
        batch_size=7,
    )
    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT k, v FROM t").fetchall())
    assert got == {i: f"v{i}" for i in range(40)}


def test_write_upsert_empty_partitions_open_no_connections(spark, tmp_path):
    """A keyed repartition scatters a small frame across
    spark.sql.shuffle.partitions slots, most of them EMPTY — those must
    not pay a connection_factory round-trip (advice r10). The factory
    counts its calls through a sidecar file; with 3 keys the count must
    be at most 3, never the shuffle-partition count."""
    db = str(tmp_path / "empty.db")
    calls = str(tmp_path / "calls")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE t (k INTEGER, v TEXT, row_hash TEXT, UNIQUE(k))")

    def factory(db=db, calls=calls):
        import os

        with open(calls, "a") as fh:
            fh.write(f"{os.getpid()}\n")
        return sqlite3.connect(db, timeout=30)

    df = spark.createDataFrame(
        [(1, "a", "h1"), (2, "b", "h2"), (3, "c", "h3")],
        "k long, v string, row_hash string",
    )
    write_upsert(df, factory, "t", keys=["k"], dialect="sqlite")
    with sqlite3.connect(db) as conn:
        assert dict(conn.execute("SELECT k, v FROM t").fetchall()) == {
            1: "a",
            2: "b",
            3: "c",
        }
    with open(calls) as fh:
        n_connections = len(fh.readlines())
    assert 1 <= n_connections <= 3

    # bounded fan-out: num_partitions pins the write parallelism
    write_upsert(df, factory, "t", keys=["k"], dialect="sqlite", num_partitions=2)
    with open(calls) as fh:
        assert len(fh.readlines()) - n_connections <= 2


def test_upsert_sql_rejects_unsafe_identifiers():
    from fund_data_pipeline_spark.sinks.jdbc_upsert import upsert_sql

    with pytest.raises(ValueError, match="unquoted"):
        upsert_sql("t; DROP TABLE x", ["k", "v"], ["k"])
    with pytest.raises(ValueError, match="unquoted"):
        upsert_sql("t", ["k", 'v"'], ["k"])
    with pytest.raises(ValueError, match="unquoted"):
        upsert_sql("t", ["k", "v"], ["k"], hash_col="row hash")
    # schema-qualified table names stay legal
    assert upsert_sql("public.master", ["k", "v", "row_hash"], ["k"]).startswith(
        "INSERT INTO public.master"
    )


def test_write_range_clustered_files_do_not_overlap(spark, tmp_path):
    """Range clustering must produce parquet files whose cluster-column
    min/max ranges are non-overlapping (this is what lets a point/range
    filter skip whole files from footer statistics at scale)."""
    import pyarrow.parquet as pq

    from fund_data_pipeline_spark.maintenance import write_range_clustered

    df = spark.range(0, 10_000).withColumnRenamed("id", "k").withColumn(
        "v", F.md5(F.col("k").cast("string"))
    )
    # shuffle the input so clustering has real work to do
    path = str(tmp_path / "clustered")
    write_range_clustered(df.orderBy("v"), path, ["k"], n_files=8)

    ranges = []
    for f in sorted((tmp_path / "clustered").glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4  # actually split across files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
    # and the data survives intact
    assert spark.read.parquet(path).count() == 10_000


def test_write_zorder_clustered_prunes_on_every_dimension(spark, tmp_path):
    """Z-order clustering must give file-skipping power on BOTH cluster
    columns: for a narrow filter on either column, most files' footer
    min/max ranges must exclude the filter value — unlike lexicographic
    range clustering, which gives the second column nothing."""
    import pyarrow.parquet as pq

    from fund_data_pipeline_spark.maintenance import (
        write_range_clustered,
        write_zorder_clustered,
    )

    n = 20_000
    # two independent uniform columns (x, y): worst case for lexicographic
    df = (
        spark.range(0, n)
        .withColumn("x", (F.col("id") * 7919) % 1000)
        .withColumn("y", (F.col("id") * 104729) % 1000)
        .drop("id")
    )

    def overlap_fraction(root, col_name, value):
        files = sorted(root.glob("*.parquet"))
        hit = 0
        for f in files:
            md = pq.ParquetFile(str(f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for c in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(c)
                    if col.path_in_schema == col_name:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None and lo <= value <= hi:
                hit += 1
        return hit / len(files), len(files)

    zpath = tmp_path / "z"
    write_zorder_clustered(df, str(zpath), ["x", "y"], n_files=16)
    rpath = tmp_path / "r"
    write_range_clustered(df, str(rpath), ["x", "y"], n_files=16)

    zx, n_zfiles = overlap_fraction(zpath, "x", 500)
    zy, _ = overlap_fraction(zpath, "y", 500)
    ry, _ = overlap_fraction(rpath, "y", 500)
    assert n_zfiles >= 8
    # z-order: a point filter on either dimension touches a minority of files
    assert zx <= 0.5, f"x-pruning too weak: {zx}"
    assert zy <= 0.5, f"y-pruning too weak: {zy}"
    # lexicographic gives the trailing column ~no pruning (sanity contrast)
    assert ry > zy
    # data intact
    assert spark.read.parquet(str(zpath)).count() == n


def test_write_zorder_clustered_temporal_and_string_columns(spark, tmp_path):
    """Date columns cluster on their epoch value (a raw double cast of DATE
    is an analysis error); string columns are rejected with a clear error."""
    import pytest

    from fund_data_pipeline_spark.maintenance import write_zorder_clustered

    df = (
        spark.range(0, 2000)
        .withColumn("d", F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")))
        .withColumn("v", (F.col("id") * 7919) % 1000)
        .withColumn("s", F.col("id").cast("string"))
    )
    path = tmp_path / "zd"
    write_zorder_clustered(df.select("d", "v"), str(path), ["d", "v"], n_files=4)
    assert spark.read.parquet(str(path)).count() == 2000

    with pytest.raises(ValueError, match="ordered numeric"):
        write_zorder_clustered(df, str(tmp_path / "zs"), ["s", "v"], n_files=4)


def test_upsert_sql_named_constraint_golden_pin():
    """VERDICT r6 item 7: the reference upserts through the NAMED unique
    constraint (db_connector.py:384-405, pg_insert ... on_conflict_do_update
    (constraint=uq_..., set_=all-but-id/updated_at, where=row_hash IS
    DISTINCT FROM excluded.row_hash)). Pin the generated statement text
    byte-for-byte for a reference staging table."""
    from fund_data_pipeline_spark.sinks.jdbc_upsert import REFERENCE_CONSTRAINTS

    sql = upsert_sql(
        "stg_price_history",
        ["ticker", "price_date", "close_price", "id", "updated_at", "row_hash"],
        keys=["ticker", "price_date"],
        constraint=REFERENCE_CONSTRAINTS["stg_price_history"],
    )
    assert sql == (
        "INSERT INTO stg_price_history "
        "(ticker, price_date, close_price, id, updated_at, row_hash) "
        "VALUES (%s, %s, %s, %s, %s, %s) "
        "ON CONFLICT ON CONSTRAINT uq_stg_price_key DO UPDATE SET "
        "close_price = excluded.close_price, row_hash = excluded.row_hash "
        "WHERE stg_price_history.row_hash IS DISTINCT FROM excluded.row_hash"
    )
    # sqlite has no named-constraint conflict target
    with pytest.raises(ValueError, match="postgres-only"):
        upsert_sql(
            "t", ["k", "v"], keys=["k"], dialect="sqlite", constraint="uq_t"
        )
    # every reference staging table has a mapped constraint
    assert len(REFERENCE_CONSTRAINTS) == 10
