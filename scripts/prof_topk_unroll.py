"""A/B: embedding_topk_cosine HOF dot vs direct per-element codegen terms.

The r16 counter-lesson showed unrolling over an INTERMEDIATE quantized
array (F.get over _quant's transform output) is 7x slower — Catalyst's
projection collapse inlines the 64-element transform into every term.
This experiment avoids any array-producing HOF on the candidate side:
each term is round(element_at(embedding, i) * 1e6)::long, used twice
(dot term x query element, square for enorm) — codegen subexpression
elimination should evaluate it once. The broadcast query side keeps the
materialized qe array (computed once inside the broadcast relation), so
element_at(qe, i) is a cheap array read, not an inlined transform.

Integer sums are order-independent, so values are bit-identical to the
HOF form if the experiment graduates; verified here by comparing the
collected top-20 rows exactly.

Usage: python scripts/prof_topk_unroll.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from fund_data_pipeline_spark.queries.registry import table
from fund_data_pipeline_spark.queries.vectors import (
    _QUERY_VEC_ID,
    _dot,
    _quant,
    EMB_DIM,
)
from fund_data_pipeline_spark.queries import QUERIES
from fund_data_pipeline_spark.session import get_spark


def unrolled(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(_quant("embedding").alias("qe"))
        .select("qe", _dot(F.col("qe"), F.col("qe")).alias("qnorm"))
    )
    cand = emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
    # per-element quantized terms straight off the stored array — no
    # intermediate transform() array for Catalyst to inline per term
    def qterm(i):
        return F.round(F.element_at(F.col("embedding"), i) * 1e6).cast("long")

    terms = [qterm(i) for i in range(1, EMB_DIM + 1)]
    dot = None
    enorm = None
    for i, t in enumerate(terms, start=1):
        d = t * F.element_at(F.col("qe"), i)
        e = t * t
        dot = d if dot is None else dot + d
        enorm = e if enorm is None else enorm + e
    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        dot.alias("dot"),
        "qnorm",
        enorm.alias("enorm"),
    )
    cosine = F.when(
        (F.col("qnorm") > 0) & (F.col("enorm") > 0),
        F.col("dot").cast("double")
        / (F.sqrt(F.col("qnorm").cast("double")) * F.sqrt(F.col("enorm").cast("double"))),
    )
    return (
        scored.filter(F.col("enorm") > 0)
        .select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(20)
    )


def fused(spark, sf_dir):
    """One zip_with + one aggregate per row instead of quant-transform +
    two (zip_with + aggregate) pairs: the lambda-call count per row drops
    from ~320 to ~128. Integer sums, order-independent — bit-identical."""
    emb = table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(_quant("embedding").alias("qe"))
        .select("qe", _dot(F.col("qe"), F.col("qe")).alias("qnorm"))
    )
    cand = emb.filter(F.col("vec_id") != _QUERY_VEC_ID)

    def term(qx, y):
        qy = F.round(y * 1e6).cast("long")
        return F.struct((qx * qy).alias("d"), (qy * qy).alias("e"))

    zipped = F.zip_with(F.col("qe"), F.col("embedding"), term)
    acc0 = F.struct(
        F.lit(0).cast("long").alias("d"), F.lit(0).cast("long").alias("e")
    )
    folded = F.aggregate(
        zipped,
        acc0,
        lambda a, v: F.struct((a["d"] + v["d"]).alias("d"), (a["e"] + v["e"]).alias("e")),
    )
    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id", "label", folded.alias("de"), "qnorm"
    ).select(
        "vec_id",
        "label",
        F.col("de.d").alias("dot"),
        "qnorm",
        F.col("de.e").alias("enorm"),
    )
    cosine = F.when(
        (F.col("qnorm") > 0) & (F.col("enorm") > 0),
        F.col("dot").cast("double")
        / (F.sqrt(F.col("qnorm").cast("double")) * F.sqrt(F.col("enorm").cast("double"))),
    )
    return (
        scored.filter(F.col("enorm") > 0)
        .select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(20)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("prof_topk_unroll")

    current = QUERIES["embedding_topk_cosine"].spark
    # warmup all, equality vs the shipped form
    rows_hof = current(spark, sf_dir).collect()
    for name, fn in (("unrolled", unrolled), ("fused", fused)):
        rows = fn(spark, sf_dir).collect()
        same = [tuple(r) for r in rows_hof] == [tuple(r) for r in rows]
        print(f"{name} rows identical: {same}")
        if not same:
            print("HOF :", [tuple(r) for r in rows_hof][:3])
            print(f"{name}:", [tuple(r) for r in rows][:3])

    for label, fn in (("hof", current), ("fused", fused)):
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        print(f"{label}: min={min(runs):.3f} runs={[round(r,3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
