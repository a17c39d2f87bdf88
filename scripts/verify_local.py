"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark at the given SF and its oracle SQL on
DuckDB over the same parquet, then compares row count, column names, and an
order-insensitive canonical value form. The comparison kernel lives in
``fund_data_pipeline_spark.oracle`` and is shared with the in-tree
``tests/test_catalog_oracle.py`` gate; this script is the interactive /
arbitrary-SF front end.

Usage: python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    # argv contract: an argument that IS a directory (or the first arg if
    # path-shaped) selects the SF dir; everything else must be a known
    # query name. Extra path-like arguments are an error, not silently
    # ignored — "verify two SFs" must not quietly verify one.
    sf_dir = "/root/testdata/sf0.01"
    only: set[str] = set()
    args = sys.argv[1:]
    if args and (Path(args[0]).is_dir() or "/" in args[0]):
        sf_dir = args[0]
        args = args[1:]
    extra_paths = [a for a in args if Path(a).is_dir() or "/" in a]
    if extra_paths:
        print(f"only one sf_dir is supported; unexpected path arguments: {extra_paths}")
        return 2
    only = set(args)

    from fund_data_pipeline_spark import queries as Q
    from fund_data_pipeline_spark.oracle import compare_query, duckdb_connect
    from fund_data_pipeline_spark.session import get_spark

    unknown = only - set(Q.QUERIES)
    if unknown:
        print(f"unknown queries: {' '.join(sorted(unknown))}")
        return 2

    spark = get_spark("verify_local")
    con = duckdb_connect(sf_dir)

    specs = {n: s for n, s in Q.QUERIES.items() if not only or n in only}
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name, spec in specs.items():
        t0 = time.time()
        try:
            problems, n_rows = compare_query(spark, con, spec, sf_dir)
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            failures.append(name)
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows-only {name}: {n_rows} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
        elif problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
            n_fail += 1
        else:
            print(f"PASS {name}: {n_rows} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(specs)}")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
