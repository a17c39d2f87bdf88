"""Stage-by-stage wall profile of corpus_dedup_pipeline (guide §1).

Replays the pipeline with a timer around each eager boundary so the
chain's cost attributes to stages: (1) exact-dedup checkpoint, (2a) LSH
candidate edges, (2b) connected components, (2c) surv2 checkpoint,
(3) SemDeDup drops, (4) quality dedup + final assembly (noop sink).
Same code path as the catalog query — the stage relations are built by
the same helpers — so the split is faithful, not a reimplementation.

Usage: python scripts/prof_pipeline_stages.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from fund_data_pipeline_spark.operators import graph
from fund_data_pipeline_spark.operators.similarity import banded_pairs_skew_bounded
from fund_data_pipeline_spark.queries.registry import table
from fund_data_pipeline_spark.queries.text import (
    fingerprint_expr,
    minhash_bands,
    quality_expr,
)
from fund_data_pipeline_spark.queries.vectors import semantic_dedup
from fund_data_pipeline_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    spark = get_spark("prof_pipeline_stages")
    # same opt-in split cap as bench_scaling.py (single-file local fixtures
    # otherwise scan on fewer splits than cores — a fixture regime, not a
    # 100 TB regime); numbers taken with it are marked as such
    mpb = os.environ.get("SPARK_GRAFT_SCALING_MPB")
    if mpb:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    t_all = time.perf_counter()
    marks: list[tuple[str, float]] = []

    def mark(name):
        marks.append((name, time.perf_counter()))

    docs = table(spark, sf_dir, "documents")
    mark("start")

    s1 = docs.select(
        "doc_id",
        "text",
        "lang",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias("exact_keeper"),
    ).localCheckpoint(eager=True)
    mark("s1_exact_checkpoint")
    drops1 = s1.filter(F.col("doc_id") != F.col("exact_keeper")).select(
        "doc_id", F.lit("exact").alias("drop_stage")
    )
    surv1 = s1.filter(F.col("doc_id") == F.col("exact_keeper")).drop("exact_keeper")

    edges = banded_pairs_skew_bounded(minhash_bands(surv1)).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    mark("s2a_lsh_edges")

    cc = graph.connected_components(
        surv1.select(F.col("doc_id").alias("node")), edges
    )
    cc.write.format("noop").mode("overwrite").save()
    mark("s2b_components")

    drops2 = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id"), F.lit("near_dup").alias("drop_stage")
    )
    surv2 = surv1.join(
        cc.filter(F.col("node") == F.col("cluster_id")).select(
            F.col("node").alias("doc_id")
        ),
        "doc_id",
        "semi",
    ).localCheckpoint(eager=True)
    mark("s2c_surv2_checkpoint")

    drops3 = semantic_dedup(
        spark, sf_dir, restrict_ids=surv2.select(F.col("doc_id").alias("vec_id"))
    ).select(F.col("vec_id").alias("doc_id"), F.lit("semantic").alias("drop_stage"))
    drops3 = drops3.localCheckpoint(eager=True)
    mark("s3_semantic")

    surv3 = surv2.join(drops3.select("doc_id"), "doc_id", "anti")
    fingerprint = fingerprint_expr(32)
    w = Window.partitionBy("fingerprint").orderBy(F.col("quality").desc(), "doc_id")
    drops4 = (
        surv3.select("doc_id", fingerprint.alias("fingerprint"), quality_expr().alias("quality"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id", F.lit("quality").alias("drop_stage"))
    )
    stages = drops1.unionByName(drops2).unionByName(drops3).unionByName(drops4)
    out = docs.select("doc_id").join(stages, "doc_id", "left").select(
        "doc_id", "drop_stage", F.col("drop_stage").isNull().alias("keep")
    )
    out.write.format("noop").mode("overwrite").save()
    mark("s4_quality_and_assembly")

    prev = t_all
    total = marks[-1][1] - t_all
    print(f"n_edges={n_edges}")
    for name, t in marks:
        print(f"{name:28s} {t - prev:7.2f}s")
        prev = t
    print(f"{'TOTAL':28s} {total:7.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
