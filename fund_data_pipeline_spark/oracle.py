"""Oracle comparison kernel shared by ``scripts/verify_local.py`` and the
in-tree ``tests/test_catalog_oracle.py`` gate.

Compares a Spark catalog query against its DuckDB oracle SQL over the same
parquet fixtures: row count, column-name set, and an order-insensitive
canonical value comparison (exact value strings, bit-exact floats) — the
same shape as the driver's CORRECTNESS check, but stricter, so a pass here
should imply a pass there. Lives in the package (not scripts/) so the
correctness gate runs inside ``pytest tests/`` and environment shifts (e.g.
the pyspark 4.1.2 TIMESTAMP_NTZ read change, VERDICT r3) are caught in-round
rather than by the driver.
"""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str):
    """A DuckDB connection with the fixture tables registered as views —
    mirrors the driver's pre-registered-view contract."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v) -> str:
    """Canonical string for one value: type-tagged, bit-exact for floats
    (``repr`` round-trips IEEE doubles), ISO for temporals."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"d:{v}"
    if isinstance(v, datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: columns sorted by name (the driver
    sorts columns before hashing), then rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def compare_query(spark, con, spec, sf_dir: str) -> tuple[list[str], int]:
    """Run one QuerySpec on Spark and (if present) its oracle on DuckDB.

    Returns ``(problems, spark_row_count)``; an empty problem list is a
    pass. Oracle-less specs (non-SQL-expressible ops) get the driver's
    weaker rows-only treatment: the Spark side must execute, nothing more.
    Exceptions propagate — a crashing query should fail loudly, not be
    folded into a comparison string.
    """
    sdf = spec.spark(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return [], len(s_rows)
    cur = con.execute(spec.oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    if not problems:
        cs, co = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
        if cs != co:
            i, a, b = next((i, a, b) for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            problems.append(f"values differ at sorted-row {i}:\n  spark : {a}\n  oracle: {b}")
    return problems, len(s_rows)
