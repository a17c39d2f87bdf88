"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (grouped pricing summary) on the
sf0.001 fixtures. ``queries()`` / ``oracle_sql()`` expose the engine's full
operator catalog from :mod:`fund_data_pipeline_spark.queries` — each Spark
callable is built on the library operators, each oracle string is the
DuckDB-equivalent ANSI SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fund_data_pipeline_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.QUERIES["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return _catalog.oracle_sql()
