"""Oracle comparison kernel shared by ``scripts/verify_local.py`` and the
in-tree ``tests/test_catalog_oracle.py`` gate.

Compares a Spark catalog query against its DuckDB oracle SQL over the same
parquet fixtures: row count, column-name set, and an order-insensitive
canonical value comparison — the same shape as the driver's CORRECTNESS
check.

Both sides are fetched **through pandas** (``DataFrame.toPandas()`` /
``duckdb .df()``), NOT ``collect()``/``fetchall()``. This deliberately
mirrors the driver's canonicalizer, including its dtype coercions: DuckDB
HUGEINT (the type of an uncast ``SUM`` over BIGINT) and DECIMAL both land
in pandas as float64, so an oracle whose top-level aggregate is uncast
produces ``7949.0`` where Spark produces ``7949`` — a value mismatch this
gate now SEES. Round 5 shipped three oracles with exactly that bug because
the previous ``fetchall()`` path yielded Python ints for HUGEINT and hid
the coercion (VERDICT r5 items 1-3, 5).

Representation notes (mirroring observed driver behavior — all green
driver rows in CORRECTNESS_r01..r05 are green under these rules):
- NaN / NaT / None  -> NULL (both engines emit NaN for nullable numerics
  through pandas, symmetrically).
- DATE through ``duckdb .df()`` becomes a midnight Timestamp; Spark
  ``toPandas`` keeps ``datetime.date`` objects. Midnight naive timestamps
  are therefore canonicalized as dates on both sides.
- ``decimal.Decimal`` (Spark DecimalType via toPandas) -> float, matching
  DuckDB's DECIMAL->float64 coercion. Final catalog outputs should still
  be explicit DOUBLE/BIGINT casts on both sides; this rule only keeps the
  comparison symmetric.
- int-kind vs float-kind **dtype** mismatch between the two frames is
  flagged even when a query returns zero rows at the test SF, so the
  uncast-aggregate bug class cannot hide behind an empty result.
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


def _from_pandas(v):
    """One pandas cell -> plain Python value with driver-mirroring coercions."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and v != v:  # NaN (plain Python float)
        return None
    if isinstance(v, np.ndarray):
        return [_from_pandas(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_from_pandas(x) for x in v]
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.generic):  # numpy scalar (incl. float64 NaN)
        out = v.item()
        if isinstance(out, float) and out != out:
            return None
        return out
    if isinstance(v, Decimal):
        return float(v)
    return v


def _rows_from_pdf(pdf) -> list[tuple]:
    return [
        tuple(_from_pandas(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def _dtype_kinds(pdf) -> dict[str, str]:
    """Column -> coarse dtype kind ('i' int-like, 'f' float, else '')."""
    kinds = {}
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        kinds[c] = {"i": "i", "u": "i", "f": "f"}.get(k, "")
    return kinds


def canon(v) -> str:
    """Canonical string for one value: type-tagged, bit-exact for floats
    (``repr`` round-trips IEEE doubles), ISO for temporals. A naive
    midnight datetime canonicalizes as its date (see module docstring)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, datetime):
        if v.tzinfo is None and v.hour == v.minute == v.second == v.microsecond == 0:
            return f"dt:{v.date().isoformat()}"
        return f"ts:{v.isoformat()}"
    if isinstance(v, date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        # netstring-style length prefix keeps the encoding INJECTIVE: with
        # a bare join, ['a,f:1'] and ['a','f:1'] collide and an
        # array-valued query could false-pass the gate (review r10)
        parts = [canon(x) for x in v]
        return "[" + ",".join(f"{len(c)}:{c}" for c in parts) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{v.hex()}"
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
    s_pdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only: no values are compared, so skip the per-cell
        # canonicalization pass entirely (review r10)
        return [], len(s_pdf)
    s_cols = list(s_pdf.columns)
    s_rows = _rows_from_pdf(s_pdf)
    o_pdf = con.execute(spec.oracle).df()
    o_cols = list(o_pdf.columns)
    o_rows = _rows_from_pdf(o_pdf)
    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    if not problems:
        # dtype-kind lint: catches HUGEINT/DECIMAL float coercion (uncast
        # aggregates) even when the result is empty at the test SF.
        sk, ok = _dtype_kinds(s_pdf), _dtype_kinds(o_pdf)
        for c in s_cols:
            a, b = sk[c], ok[c]
            if {a, b} == {"i", "f"}:
                problems.append(
                    f"dtype coercion on column {c!r}: spark kind={a!r} vs oracle "
                    f"kind={b!r} — likely an uncast aggregate (DuckDB HUGEINT/"
                    f"DECIMAL -> float64); CAST the oracle output explicitly"
                )
    if not problems:
        cs, co = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
        if cs != co:
            i, a, b = next((i, a, b) for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            problems.append(f"values differ at sorted-row {i}:\n  spark : {a}\n  oracle: {b}")
    return problems, len(s_rows)
