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
        if name in QUERIES:
            # a silent overwrite would un-gate the shadowed query: the name
            # stays registered, so the window/exclusion accounting in
            # queries/__init__ could never notice the first query vanished
            raise ValueError(f"catalog query {name!r} is already registered")
        QUERIES[name] = QuerySpec(name=name, spark=fn, oracle=oracle, headline=headline, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table. The session is normalized (UTC) via
    :func:`fund_data_pipeline_spark.session.normalize_session` — sessions from
    :func:`get_spark` are already normalized at build; for a harness-owned
    session this is the single defensive entry point, unconditional on every
    call so read behavior never depends on table order. The events ``ts``
    column is normalized to TimestampType structurally
    (:func:`~fund_data_pipeline_spark.session.normalize_event_ts`) so every
    downstream query sees one dtype regardless of Spark version."""
    from ..session import normalize_event_ts, normalize_session

    normalize_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df
