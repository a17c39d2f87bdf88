"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark at the given SF and its oracle SQL on
DuckDB over the same parquet, then compares row count, column names, and an
order-insensitive canonical value hash. Stricter than the driver is likely
to be (exact value strings, bit-exact floats) so a pass here should imply a
pass there.

Usage: python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")


def canon(v) -> str:
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
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if "/" not in a)

    from fund_data_pipeline_spark import queries as Q
    from fund_data_pipeline_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    specs = {n: s for n, s in Q.QUERIES.items() if not only or n in only}
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name, spec in specs.items():
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows-only {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems:
            cs, co = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
            if cs != co:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(cs, co)) if a != b)
                problems.append(f"values differ at sorted-row {diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(specs)}")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
