#!/usr/bin/env python3
"""Exponent sweep for simhash_pairs' max_df_frac cap (r14 verdict item 4).

Regime under test — STOPWORD DOMINANCE: every document shares a large
ubiquitous token set (400 stopwords) plus 1 distinctive content token per
2-document group (the planted near-dup pair; doc 2g+1 also misses one
stopword). With ~400 shared voters per signature bit, a one-token content
difference flips a bit only where the stopword margin is exactly zero
(~2% of bits), so documents with 100% different content land within
hamming<=3 of 120 — the candidate relation (and the OUTPUT) is Theta(n^2).
With the cap the stopwords drop, signatures are pure content, and the
output is exactly the n/2 planted pairs — linear by construction.

The r13 sf10-wide fixture is NOT this regime: its whole 31-token
vocabulary is ubiquitous (no discriminative tail), so the cap's empty-set
fallback makes it a measured no-op there — asserted by
tests/test_operators.py::test_simhash_max_df_cap_recall_and_fallback's
fallback case and re-measured by --wide-noop below.

Writes corpora under .localdata/stopword/n<N>/documents.parquet
(regenerable, gitignored) and prints one JSON line per measured point:
{"mode": "capped"|"uncapped", "n_docs": N, "pairs": P, "planted_ok": bool,
 "wall_s": W}. Uncapped points are size-capped (the n^2 output IS the
pathology being demonstrated).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / ".localdata" / "stopword"
STOP = [f"the{i}" for i in range(400)]
STOP_TEXT = " ".join(STOP)
STOP_TEXT_SHORT = " ".join(STOP[:-1])

UNCAPPED_SIZES = (2500, 5000, 10000)
CAPPED_SIZES = (12500, 50000, 200000)


def gen(n_docs: int) -> Path:
    path = OUT / f"n{n_docs}"
    f = path / "documents.parquet"
    if f.exists():
        return path
    path.mkdir(parents=True, exist_ok=True)
    ids, texts = [], []
    batches = []
    for i in range(n_docs):
        g = i // 2
        base = STOP_TEXT if i % 2 == 0 else STOP_TEXT_SHORT
        ids.append(i)
        texts.append(f"{base} g{g}content")
        if len(ids) == 50_000:
            batches.append(pa.record_batch([pa.array(ids, pa.int64()), pa.array(texts)], ["doc_id", "text"]))
            ids, texts = [], []
    if ids:
        batches.append(pa.record_batch([pa.array(ids, pa.int64()), pa.array(texts)], ["doc_id", "text"]))
    pq.write_table(pa.Table.from_batches(batches), f)
    return path


def measure(spark, path: Path, n_docs: int, capped: bool) -> dict:
    from pyspark.sql import functions as F

    from fund_data_pipeline_spark.operators.similarity import simhash_pairs

    docs = spark.read.parquet(str(path / "documents.parquet"))
    t0 = time.time()
    pairs = simhash_pairs(docs, n_words=2, max_df_frac=0.4 if capped else None)
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("doc_id_b") == F.col("doc_id_a") + 1)
                & (F.col("doc_id_a") % 2 == 0),
                1,
            ).otherwise(0)
        ).alias("planted"),
    ).first()
    wall = time.time() - t0
    return {
        "mode": "capped" if capped else "uncapped",
        "n_docs": n_docs,
        "pairs": agg["n"],
        "planted_ok": (agg["planted"] or 0) == n_docs // 2,
        "wall_s": round(wall, 1),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from fund_data_pipeline_spark.session import get_spark

    spark = get_spark("simhash-cap-sweep", shuffle_partitions=32)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
    for n in UNCAPPED_SIZES:
        print(json.dumps(measure(spark, gen(n), n, capped=False)), flush=True)
    for n in CAPPED_SIZES:
        print(json.dumps(measure(spark, gen(n), n, capped=True)), flush=True)
    if "--wide-noop" in sys.argv:
        # the degenerate no-tail fixture: cap must be a measured no-op
        from pyspark.sql import functions as F

        from fund_data_pipeline_spark.operators.similarity import simhash_pairs

        docs = spark.read.parquet(str(REPO / ".localdata" / "sf1wide" / "documents.parquet"))
        for capped in (False, True):
            t0 = time.time()
            n = simhash_pairs(docs, n_words=2, max_df_frac=0.4 if capped else None).count()
            print(
                json.dumps(
                    {
                        "mode": f"sf1wide-{'capped' if capped else 'uncapped'}",
                        "pairs": n,
                        "wall_s": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
