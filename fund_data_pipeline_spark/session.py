"""SparkSession factory tuned for the harness (local[N]) but scale-ready.

The same settings hold on a real cluster: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), UTC session time zone (oracle
comparability + sanity at scale), Arrow for any pandas interchange.
Only ``shuffle.partitions`` is environment-derived — cores locally,
2-3x total executor cores on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "fund_data_pipeline_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # >32g heaps lose CompressedOops and were observed to stall JVM
        # startup in this container; 30g is plenty for sf0.1 on local[32].
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "30g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None) -> dict:
    """Read the fixture star schema from ``sf_dir`` and register temp views."""
    names = tables or (
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
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
