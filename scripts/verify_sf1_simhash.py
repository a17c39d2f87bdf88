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


def replay(sf_dir: str, n_words: int = 1):
    """``n_words=1`` replays the 60-bit catalog signature (4x15-bit
    bands); ``n_words=2`` replays the 120-bit production form
    (``simhash_wide_pairs``): word ``w`` is md5 hex chars
    [16w, 16w+15), 4x30-bit bands (band b slices word b//2 at offset
    30*(b%2)), Hamming summed over both words — exactly
    ``operators/similarity.py::simhash_pairs``."""
    import numpy as np
    import pyarrow.parquet as pq

    total_bits = 60 * n_words
    band_bits = total_bits // N_BANDS
    bands_per_word = 60 // band_bits
    band_mask = (1 << band_bits) - 1

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

    digests = [hashlib.md5(tok.encode("utf-8")).hexdigest() for tok in vocab]
    word_sigs = []
    flat = np.concatenate([np.asarray(ix, dtype=np.int64) for ix in doc_tok_idx])
    offsets = np.zeros(len(doc_tok_idx), dtype=np.int64)
    np.cumsum([len(ix) for ix in doc_tok_idx[:-1]], out=offsets[1:])
    for w in range(n_words):
        hvs = np.fromiter(
            (int(d[16 * w : 16 * w + 15], 16) for d in digests),
            dtype=np.int64,
            count=len(vocab),
        )
        # vocabulary bit-vote matrix: ±1 per (token, bit)
        V = (((hvs[:, None] >> np.arange(N_BITS)[None, :]) & 1) * 2 - 1).astype(np.int32)
        S = np.add.reduceat(V[flat], offsets, axis=0)  # (n_docs, 60) vote sums
        word_sigs.append(((S > 0).astype(np.int64) << np.arange(N_BITS)[None, :]).sum(axis=1))

    ids = np.asarray(doc_ids, dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    word_sigs = [s[order] for s in word_sigs]

    pair_keys: set[int] = set()
    out = []
    id_max_plus = int(ids.max()) + 1
    for b in range(N_BANDS):
        band_vals = (word_sigs[b // bands_per_word] >> (band_bits * (b % bands_per_word))) & band_mask
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
            ham = np.zeros(len(pa), dtype=np.int64)
            for sigs in word_sigs:
                x = np.bitwise_xor(sigs[pa], sigs[pb])
                # popcount via the uint8 view lookup
                ham += np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)
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

    from fund_data_pipeline_spark.queries import QUERIES
    from fund_data_pipeline_spark.session import get_spark

    # both registered forms: the 60-bit correctness pin and the 120-bit
    # production width (simhash_wide_pairs, r13) — plus the subset
    # contract between them (hamming120 <= 3 implies the pair is in the
    # 60-bit set; see operators/similarity.py::simhash_pairs)
    targets = {
        "simhash_near_dup": (1, ("doc_a", "doc_b")),
        "simhash_wide_pairs": (2, ("doc_id_a", "doc_id_b")),
    }
    spark = get_spark("verify_sf1_simhash")
    rc = 0
    results = {}
    for name, (n_words, (ca, cb)) in targets.items():
        want = replay(sf_dir, n_words=n_words)
        print(f"numpy replay {name} ({60 * n_words}-bit): {len(want)} near-dup pairs")
        got = sorted(
            (r[ca], r[cb], r.hamming)
            for r in QUERIES[name].spark(spark, sf_dir).collect()
        )
        results[name] = got
        if got == want:
            print(f"PASS {name}@{sf_dir}: {len(got)} pairs match exactly")
            continue
        rc = 1
        only_want = set(want) - set(got)
        only_got = set(got) - set(want)
        print(f"FAIL {name}: {len(only_want)} pairs only in replay, {len(only_got)} only in Spark")
        for row in sorted(only_want)[:5]:
            print("  replay-only:", row)
        for row in sorted(only_got)[:5]:
            print("  spark-only :", row)
    wide_ids = {(a, b) for a, b, _ in results.get("simhash_wide_pairs", [])}
    narrow_ids = {(a, b) for a, b, _ in results.get("simhash_near_dup", [])}
    extra = wide_ids - narrow_ids
    if extra:
        rc = 1
        print(f"FAIL subset contract: {len(extra)} wide pairs not in the 60-bit set")
    else:
        print(f"subset contract holds: {len(wide_ids)} wide pairs ⊆ {len(narrow_ids)} 60-bit pairs")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
