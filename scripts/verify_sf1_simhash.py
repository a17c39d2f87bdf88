"""sf1 verification for ``simhash_near_dup`` — the banded-pair DuckDB
oracle replaced by an exact vectorized replay.

The registered oracle enumerates banded candidate pairs in SQL (fine at
the driver's sf0.01 gate, quadratic-ish on sf1's deliberately hot bands).
This replay shares every semantic with both engines:

1. Distinct plain-space tokens per document (``string_split(text, ' ')``
   — deliberately NOT the WS class; the query pins the single-space
   spelling on both sides).
2. ``hv = int(md5(token)[:15], 16)`` — 60 bits, identical to both
   engines' ``conv(substr(md5, 1, 15), 16, 10)``.
3. Per-bit ±1 votes summed per document (vectorized with
   ``np.add.reduceat`` over the vocabulary bit matrix), signature bit set
   iff the vote sum is strictly positive.
4. 4x15-bit banding; candidate pairs (a < b) share >= 1 band; exact
   Hamming distance ``popcount(xor) <= 3``.

All arithmetic is integer, so the replay is bit-exact by construction.
Run: ``python scripts/verify_sf1_simhash.py [sf_dir]`` (default
``.localdata/sf1``). Exit 0 on exact match against the Spark query.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_BITS, N_BANDS, HAMMING_MAX = 60, 4, 3


def replay(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()

    vocab: dict[str, int] = {}
    doc_tok_idx: list[list[int]] = []
    for text in texts:
        idxs = []
        for tok in set((text or "").split(" ")):
            i = vocab.get(tok)
            if i is None:
                i = len(vocab)
                vocab[tok] = i
            idxs.append(i)
        doc_tok_idx.append(idxs)

    hvs = np.fromiter(
        (int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16) for tok in vocab),
        dtype=np.int64,
        count=len(vocab),
    )
    # vocabulary bit-vote matrix: ±1 per (token, bit)
    V = (((hvs[:, None] >> np.arange(N_BITS)[None, :]) & 1) * 2 - 1).astype(np.int32)
    flat = np.concatenate([np.asarray(ix, dtype=np.int64) for ix in doc_tok_idx])
    offsets = np.zeros(len(doc_tok_idx), dtype=np.int64)
    np.cumsum([len(ix) for ix in doc_tok_idx[:-1]], out=offsets[1:])
    S = np.add.reduceat(V[flat], offsets, axis=0)  # (n_docs, 60) vote sums
    sigs = ((S > 0).astype(np.int64) << np.arange(N_BITS)[None, :]).sum(axis=1)

    ids = np.asarray(doc_ids, dtype=np.int64)
    order = np.argsort(ids)
    ids, sigs = ids[order], sigs[order]

    pair_keys: set[int] = set()
    out = []
    id_max_plus = int(ids.max()) + 1
    for b in range(N_BANDS):
        band_vals = (sigs >> (15 * b)) & 32767
        buckets: dict[int, list[int]] = {}
        for pos, bv in enumerate(band_vals):
            buckets.setdefault(int(bv), []).append(pos)
        for members in buckets.values():
            m = len(members)
            if m < 2:
                continue
            arr = np.asarray(members)
            ai, bi = np.triu_indices(m, k=1)
            pa, pb = arr[ai], arr[bi]
            ham = np.bitwise_xor(sigs[pa], sigs[pb])
            # popcount via the uint8 view lookup
            ham = np.unpackbits(ham.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            keep = ham <= HAMMING_MAX
            for x, y, h in zip(pa[keep], pb[keep], ham[keep]):
                a_id, b_id = int(ids[x]), int(ids[y])
                key = a_id * id_max_plus + b_id
                if key not in pair_keys:
                    pair_keys.add(key)
                    out.append((a_id, b_id, int(h)))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".localdata" / "sf1")
    want = replay(sf_dir)
    print(f"numpy replay: {len(want)} near-dup pairs")

    from fund_data_pipeline_spark.queries import QUERIES
    from fund_data_pipeline_spark.session import get_spark

    spark = get_spark("verify_sf1_simhash")
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["simhash_near_dup"].spark(spark, sf_dir).collect()
    )
    if got == want:
        print(f"PASS simhash_near_dup@{sf_dir}: {len(got)} pairs match exactly")
        return 0
    only_want = set(want) - set(got)
    only_got = set(got) - set(want)
    print(f"FAIL: {len(only_want)} pairs only in replay, {len(only_got)} only in Spark")
    for row in sorted(only_want)[:5]:
        print("  replay-only:", row)
    for row in sorted(only_got)[:5]:
        print("  spark-only :", row)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
