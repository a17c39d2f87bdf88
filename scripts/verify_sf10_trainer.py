"""Production-width proof run for ``train_codebook_distributed`` (r15
verdict item 3): train a ~1k-cell codebook on the sf10 fixture (200k
vectors, 10x the SemDeDup-scaled production sizing of 195 cells), feed
the trained codebook straight through ``semantic_dedup(codebook=...)``,
and pin trainer DETERMINISM by replaying the full train and comparing an
md5 over the sorted ``(cid, qe)`` rows — the md5-rank init plus
integer-rounded means make the whole run exactly reproducible with no
RNG, so the two hashes must be byte-identical.

Reported per run (one JSON line, SCALING.md carries the numbers):
  - ``train_wall_sec`` and ``per_iter_sec`` (total / iters; every
    iteration is localCheckpoint-pinned eager, so each loop's assignment
    scan + k x dims mean aggregate actually executes inside the loop)
  - ``replay_wall_sec`` + ``deterministic`` (hash equality)
  - ``dedup_wall_sec`` + ``drops`` for semantic_dedup over the trained
    codebook (the end-to-end production story: both halves in-engine)

Run: ``python scripts/verify_sf10_trainer.py [sf_dir] [k] [iters]``
(defaults ``.localdata/sf10``, 1024, 5). Exit 0 iff the replay hash
matches and the dedup run completes with > 0 drops.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def codebook_md5(cb) -> str:
    rows = sorted((r["cid"], tuple(r["qe"])) for r in cb.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".localdata" / "sf10")
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from fund_data_pipeline_spark.queries.registry import table
    from fund_data_pipeline_spark.queries.vectors import (
        _quant,
        semantic_dedup,
        train_codebook_distributed,
    )
    from fund_data_pipeline_spark.session import get_spark

    spark = get_spark("verify_sf10_trainer")
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _quant("embedding").alias("qe")
    )
    n = emb.count()

    t0 = time.perf_counter()
    cb = train_codebook_distributed(emb, k=k, iters=iters)
    h1 = codebook_md5(cb)  # collect() forces the final checkpoint too
    train_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    h2 = codebook_md5(train_codebook_distributed(emb, k=k, iters=iters))
    replay_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    drops = semantic_dedup(spark, sf_dir, codebook=cb).count()
    dedup_wall = time.perf_counter() - t0

    # context: how many distinct cells the trained codebook actually uses
    # on this corpus (dead centers persist at width k by contract)
    used = (
        semantic_dedup(spark, sf_dir, codebook=cb)
        .agg(F.countDistinct("cell"))
        .collect()[0][0]
    )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": n,
                "k": k,
                "iters": iters,
                "train_wall_sec": round(train_wall, 1),
                "per_iter_sec": round(train_wall / iters, 1),
                "replay_wall_sec": round(replay_wall, 1),
                "deterministic": h1 == h2,
                "codebook_md5": h1,
                "dedup_wall_sec": round(dedup_wall, 1),
                "drops": drops,
                "cells_with_drops": used,
            }
        )
    )
    return 0 if (h1 == h2 and drops > 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
