"""Row-hash change-detection expressions (SURVEY §2.10, H1-H10).

All are single Column expressions (md5/sha2 over concat), evaluated
JVM-side, reproducing the reference's hash SHAPES (same columns, same
separators, same null coercion rule). Byte-parity scope — what a
migration comparing hashes across systems must know:

- exact for STRING / integer / date-formatted inputs (the H2/H5/H7
  master and key hashes): str(value) agrees between engines there;
- NOT exact where the reference stringified raw pandas floats (H3/H4
  over unconformed CSV floats: pandas emits '10.5' / 'nan' /
  '12345.0' where a conformed DECIMAL renders '10.5000' and NULL
  coerces to '') or JSON (H1: json.dumps uses ', ' separators and
  keeps nulls; Spark to_json is compact and drops null fields).
  A migration from reference-produced H1/H3/H4 hashes must recompute
  them once rather than compare bytes; within this engine every hash
  is self-consistent and the merge guard behaves identically.

Parity targets (paths relative to /root/reference/):
- H1 md5 of sorted-key JSON: src/utils/hasher.py:8-11
- H2 md5 of separator-less concat, None->'': src/utils/hasher.py:16-18
- H3 sha256 of OHLCV concat: 02_performance_sync/02_history_hasher.py:31-36
- H4 sha256 of ex_date+amount+type: 02_performance_sync/02_dividend_hasher.py:11-14
- H5 sha256 pipe-delimited normalized key: scripts/bulk_import_from_hashed.py:96-105
- H6 all-columns-except hash: 03_detail_sync/02_static_hasher.py:23-28
- H7 master row hash: 01_master_sync/04_master_list_loader.py:56
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: unit-separator used by the v2 (collision-safe) hash
SAFE_SEP = "\x1f"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_str(col: Column | str) -> Column:
    """str(value) with None -> '' — matches the reference's coercion."""
    return F.coalesce(_c(col).cast("string"), F.lit(""))


def row_hash_concat(cols: Sequence[Column | str]) -> Column:
    """H2: md5(''.join(str(a) if a is not None else '')) — byte-compatible.

    NOTE (inherited quirk): separator-less concat means ('ab','c') collides
    with ('a','bc'); kept for hash parity. Use :func:`row_hash_safe` for new
    tables.
    """
    return F.md5(F.concat(*[_as_str(c) for c in cols]))


def row_hash_safe(cols: Sequence[Column | str]) -> Column:
    """v2 hash: md5 over unit-separator-joined values (collision-safe)."""
    return F.md5(F.concat_ws(SAFE_SEP, *[_as_str(c) for c in cols]))


def row_hash_json(df_or_cols: DataFrame | Sequence[str]) -> Column:
    """H1: md5 of json.dumps(row_dict, sort_keys=True, default=str).

    Reproduced as md5(to_json(struct(*sorted(cols)))) — column order is the
    sorted key order, matching ``sort_keys=True``.
    """
    names = sorted(df_or_cols.columns) if isinstance(df_or_cols, DataFrame) else sorted(df_or_cols)
    return F.md5(F.to_json(F.struct(*[F.col(n) for n in names])))


def ohlcv_hash(
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    adj_close_col: str = "adj_close",
    volume_col: str = "volume",
) -> Column:
    """H3: sha256 over OHLCV string-concat, missing -> ''."""
    cols = [open_col, high_col, low_col, close_col, adj_close_col, volume_col]
    return F.sha2(F.concat(*[_as_str(c) for c in cols]), 256)


def dividend_hash(ex_date: str = "ex_date", amount: str = "amount", type_col: str = "type") -> Column:
    """H4: sha256(str(ex_date) + str(amount) + str(type))."""
    return F.sha2(F.concat(_as_str(ex_date), _as_str(amount), _as_str(type_col)), 256)


def normalized_key_hash(
    ticker: str = "ticker",
    asset_type: str = "asset_type",
    source: str = "source",
    ex_date: str = "ex_date",
    amount: str = "amount",
) -> Column:
    """H5: sha256 of pipe-joined lower/strip ticker+asset_type, source, ISO date,
    '%.6f' amount. EVERY part is NULL-coalesced to '': ``concat_ws``
    silently drops NULL elements, so an uncoalesced NULL ticker would
    collapse the field count and shift field boundaries — cross-field
    collisions, and never the reference's fixed five-part key
    (bulk_import_from_hashed.py:96-105)."""
    amount_c = _c(amount).cast("double")
    parts = [
        F.coalesce(F.lower(F.trim(_c(ticker))), F.lit("")),
        F.coalesce(F.lower(F.trim(_c(asset_type))), F.lit("")),
        _as_str(source),
        F.coalesce(F.date_format(_c(ex_date), "yyyy-MM-dd"), F.lit("")),
        # format_string('%.6f', NULL) yields the STRING 'null' (Java
        # String.format), not NULL — it must be guarded, not coalesced
        F.when(amount_c.isNull(), F.lit("")).otherwise(F.format_string("%.6f", amount_c)),
    ]
    return F.sha2(F.concat_ws("|", *parts), 256)


def all_columns_hash(df: DataFrame, exclude: Sequence[str] = ("row_hash", "updated_at")) -> Column:
    """H6: hash over every column except audit cols, in current column order."""
    cols = [c for c in df.columns if c not in set(exclude)]
    return F.md5(F.concat(*[_as_str(c) for c in cols]))


def master_row_hash() -> Column:
    """H7: H2 over (ticker, asset_type, source, name, status)."""
    return row_hash_concat(["ticker", "asset_type", "source", "name", "status"])


def with_row_hash(df: DataFrame, hash_expr: Column | None = None) -> DataFrame:
    """Attach ``row_hash`` (+ refresh ``updated_at`` — H10) to a DataFrame."""
    expr = hash_expr if hash_expr is not None else all_columns_hash(df)
    out = df.withColumn("row_hash", expr)
    return out.withColumn("updated_at", F.current_timestamp())


def degenerate_hash_guard(df: DataFrame, hash_col: str = "row_hash") -> bool:
    """G4: detect a degenerate hash column (<=1 distinct value) cheaply."""
    n = df.select(F.approx_count_distinct(hash_col).alias("n")).first()["n"]
    return n <= 1
