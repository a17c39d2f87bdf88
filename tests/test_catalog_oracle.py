"""Full-catalog oracle gate: every registered query vs its DuckDB oracle.

This is the in-tree version of the driver's CORRECTNESS check (and of
``scripts/verify_local.py``): each catalog entry runs on Spark at the test
SF and is compared — row count, column names, order-insensitive canonical
values — against its ANSI-SQL oracle on DuckDB over the same parquet.
Oracle-less entries get the driver's weaker rows-only check (must execute).

Parametrized per query so a regression names the exact entry, and so the
out-of-window queries (``queries/__init__._OUT_OF_WINDOW_WHY``) are gated by
``pytest tests/`` — environment shifts like the pyspark 4.1.2 TIMESTAMP_NTZ
read change (VERDICT r3) fail here, in-round, not at the driver.

Runs at sf0.001 (a couple of minutes for the full catalog, dominated by
streaming drains).
"""

from __future__ import annotations

import pytest

from fund_data_pipeline_spark import queries as Q
from fund_data_pipeline_spark.oracle import compare_query, duckdb_connect


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(Q.QUERIES))
def test_catalog_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = Q.QUERIES[name]
    problems, n_rows = compare_query(spark, oracle_con, spec, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
    if spec.oracle is None:
        # rows-only contract: executed successfully; result shape is covered
        # by the op's dedicated pytest (e.g. image_decode_features golden test)
        assert n_rows >= 0
