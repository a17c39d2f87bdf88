from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: QueryFn
    oracle: str | None
    headline: bool = False
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, headline: bool = False, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name=name, spark=fn, oracle=oracle, headline=headline, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table, normalizing session quirks the driver's own
    SparkSession may carry: UTC semantics for timestamp<->date conversions
    (oracle comparability) and nanosecond parquet timestamps (events.ts),
    which Spark reads as long-nanos and we convert losslessly to the native
    TimestampType (the fixture's values are microsecond-resolution)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
