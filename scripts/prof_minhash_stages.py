"""Stage isolation of minhash_lsh_candidates (guide §1): where does the
aux-bench time go — signature/banding, the grid self-join, or the final
cross-band pair distinct?

Variants (noop sink unless noted, min over n_runs after one warmup):
  bands     — minhash_bands(docs) alone (signature + band fanout)
  join      — blocked grid self-join, ids projected, NO distinct
  full      — banded_pairs_skew_bounded (join + distinct), the query path
  full_collect — the query path with .collect(), bench.py's exact action

Usage: python scripts/prof_minhash_stages.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from fund_data_pipeline_spark.operators.similarity import (
    banded_pairs_skew_bounded,
    blocked_self_join,
)
from fund_data_pipeline_spark.queries.registry import table
from fund_data_pipeline_spark.queries.text import minhash_bands
from fund_data_pipeline_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("prof_minhash_stages")
    docs = table(spark, sf_dir, "documents")

    def bands_df():
        return minhash_bands(docs)

    variants = {
        "bands": lambda: noop(bands_df()),
        "join": lambda: noop(
            blocked_self_join(bands_df(), ("band", "band_key"), "doc_id")
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        ),
        "full": lambda: noop(banded_pairs_skew_bounded(bands_df())),
        "full_collect": lambda: banded_pairs_skew_bounded(bands_df()).collect(),
    }
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"prof_minhash:{name}")
        fn()  # warmup
        times = []
        for _ in range(n_runs):
            t = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t)
        print(f"{name:14s} min={min(times):.3f} runs={[round(x, 3) for x in times]}")


if __name__ == "__main__":
    main()
