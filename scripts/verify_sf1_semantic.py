"""sf1 verification for ``semantic_dedup_cells`` — quadratic-per-cell
DuckDB oracle replaced by an exact numpy replay.

The registered oracle enumerates every within-cell pair in SQL
(list_transform dot products per pair), which is fine at the driver's
sf0.01 gate but quadratic-per-cell at sf1's ~1.3k-vector cells. This
script verifies the SAME contract with the same exact arithmetic, using
gram matrices instead of per-pair SQL:

1. Quantize with the Arrow kernel's own HALF_UP rounding
   (``operators.similarity._round_half_away`` — float32 widened to
   float64 BEFORE the 1e6 scale, exactly like both engines).
2. Cell assignment: argmin over the first-``N_IVF_CELLS`` centroid
   codebook of the exact integer distance ``ce·ce - 2·qe·ce`` (the row's
   own term is constant and dropped), ties to the smallest cid —
   ``np.argmin`` first-occurrence matches ``array_min`` struct ordering.
3. Within each cell, the full integer gram matrix gives every pair's
   exact dot/norms (int64 — max |component| 1e6, 64 dims, well inside
   range); cosine is computed in the engines' exact operation order
   ``double(dot) / (sqrt(double(h)) * sqrt(double(l)))`` (each op
   correctly rounded IEEE, so bit-identical to both engines); zero-norm
   vectors pair with nothing (both engines' NULL/guard semantics).
4. Per higher-id vector with >= 1 lower-id dup at cosine >= TAU:
   (vec_id, cell, n_dups, best_cosine, witness_id) — compared
   bit-exactly against the Spark query's result.

Run: ``python scripts/verify_sf1_semantic.py [sf_dir]`` (default
``.localdata/sf1``). Exit 0 on exact match.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def replay(sf_dir: str, restrict_ids=None, n_cells: int | None = None) -> list[tuple]:
    """``restrict_ids`` (a set of vec_ids, or None) mirrors the operator's
    ``restrict_ids`` hook: the centroid codebook still comes from the FULL
    table (stable cell geometry), membership is restricted — the
    corpus-dedup pipeline's stage-3 contract. ``n_cells`` overrides the
    fixed catalog codebook width (pass ``cells_for_corpus(n)`` to replay
    the ``semantic_dedup_scaled`` production form)."""
    import numpy as np
    import pyarrow.parquet as pq

    from fund_data_pipeline_spark.operators.similarity import _round_half_away
    from fund_data_pipeline_spark.queries.vectors import N_IVF_CELLS, SEMDEDUP_TAU

    if n_cells is None:
        n_cells = N_IVF_CELLS
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    q = _round_half_away(emb.astype("float64") * 1e6).astype(np.int64)

    order = np.argsort(vec_ids)
    vec_ids, q = vec_ids[order], q[order]
    cent_mask = vec_ids < n_cells
    cids = vec_ids[cent_mask]
    C = q[cent_mask]
    if restrict_ids is not None:
        keep = np.asarray([int(v) in restrict_ids for v in vec_ids])
        vec_ids, q = vec_ids[keep], q[keep]
    # exact integer distance, row's own term dropped; argmin -> first
    # occurrence = smallest cid (cids ascend with the sort above)
    dists = (C.astype(object) ** 2).sum(axis=1)[None, :] - 2 * (q @ C.T).astype(object)
    cell_idx = np.argmin(dists, axis=1)
    cells = cids[cell_idx]

    out = []
    for cell in np.unique(cells):
        m = cells == cell
        ids, M = vec_ids[m], q[m]
        norms = (M * M).sum(axis=1)  # int64: 64 * (1e6)^2 = 6.4e13
        G = M @ M.T
        n = len(ids)
        for b in range(n):
            if norms[b] == 0:
                continue
            n_dups, best, witness = 0, None, None
            for a in range(n):
                if ids[a] >= ids[b] or norms[a] == 0:
                    continue
                cos = float(G[a, b]) / (math.sqrt(float(norms[b])) * math.sqrt(float(norms[a])))
                if cos >= SEMDEDUP_TAU:
                    n_dups += 1
                    if best is None or cos > best:
                        best = cos
                    if witness is None or ids[a] < witness:
                        witness = int(ids[a])
            if n_dups:
                out.append((int(ids[b]), int(cell), n_dups, best, witness))
    return sorted(out)


def main() -> int:
    import pyarrow.parquet as pq

    from fund_data_pipeline_spark.queries import QUERIES
    from fund_data_pipeline_spark.queries.vectors import cells_for_corpus
    from fund_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".localdata" / "sf1")
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    # both registered forms: the fixed-cell correctness pin and the
    # cells_for_corpus-sized production row (semantic_dedup_scaled, r14)
    targets = {
        "semantic_dedup_cells": None,
        "semantic_dedup_scaled": cells_for_corpus(n_rows),
    }
    spark = get_spark("verify_sf1_semantic")
    rc = 0
    for name, n_cells in targets.items():
        want = replay(sf_dir, n_cells=n_cells)
        cells_note = f" ({n_cells} cells)" if n_cells is not None else ""
        print(f"numpy replay {name}{cells_note}: {len(want)} dropped vectors")
        got = sorted(
            (r.vec_id, r.cell, r.n_dups, r.best_cosine, r.witness_id)
            for r in QUERIES[name].spark(spark, sf_dir).collect()
        )
        if got == want:
            print(f"PASS {name}@{sf_dir}: {len(got)} rows match exactly")
            continue
        rc = 1
        only_want = set(want) - set(got)
        only_got = set(got) - set(want)
        print(f"FAIL {name}: {len(only_want)} rows only in replay, {len(only_got)} only in Spark")
        for row in sorted(only_want)[:5]:
            print("  replay-only:", row)
        for row in sorted(only_got)[:5]:
            print("  spark-only :", row)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
