"""Generate a local sf10 fixture (100x sf0.1) for four-decade scaling runs.

Reuses gen_sf1's key-remapping and embedding-perturbation machinery at
FACTOR=100 (both are copy-count-safe: offsets are pure integer multiples,
noise seeds 7c+1 are distinct per copy). Documents need a DIFFERENT
permutation scheme: gen_sf1's stride-interleave x rotation family has at
most ~(n-2)*n distinct members for an n-token document — ~80 for the
fixture's 10-token minimum, fewer than the 99 non-identity copies needed
here, so short documents would collide into cross-copy EXACT duplicates
and inflate every dedup chain (the precise artifact the r9/r10 fixture
fixes eliminated). Instead each token count n gets a deterministic table
of 99 pairwise-distinct, non-identity permutations:

- n <= 7: enumerate all n! permutations, drop the identity, take a seeded
  sample without replacement (n=5 yields 119 >= 99 — guaranteed distinct
  for every n >= 5).
- n > 7: seeded Fisher-Yates draws with rejection of repeats/identity
  (n! >= 40320, collisions vanishingly rare, rejection makes distinctness
  unconditional).
- n in (3, 4): capacity is 5 / 23 permutations — copies cycle through
  them, so sub-5-token documents DO repeat across some copies (documented
  residual, none exist in this fixture: min token count is 10).
- n < 3: passed through unchanged (no shingles to protect).

The permutation preserves the token multiset (length / quality / language
stats unchanged) and destroys adjacency (shingles, MinHash bands, simhash
grams), so the near-dup structure scales like a real 100x corpus.

Size: ~1.8 GB under ``.localdata/sf10`` (gitignored, regenerable).
Run: ``python scripts/gen_sf10.py [dst]``.
"""

from __future__ import annotations

import itertools
import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
import gen_sf1  # noqa: E402  (shared relational/embedding machinery)

SRC = gen_sf1.SRC
FACTOR = 100
N_PERMS = FACTOR - 1  # copy 0 is the original


def _perm_table(n: int, k: int = N_PERMS) -> list[np.ndarray]:
    """k deterministic pairwise-distinct non-identity permutations of
    range(n) — or as many as exist (n! - 1) for tiny n, cycled by the
    caller."""
    identity = tuple(range(n))
    rng = np.random.RandomState(10_007 + n)
    if n <= 7:
        pool = [p for p in itertools.permutations(range(n)) if p != identity]
        idx = rng.permutation(len(pool))[: min(k, len(pool))]
        return [np.asarray(pool[i]) for i in idx]
    perms: list[np.ndarray] = []
    seen = {identity}
    while len(perms) < k:
        p = rng.permutation(n)
        t = tuple(p)
        if t not in seen:  # rejection: distinctness unconditional
            seen.add(t)
            perms.append(p)
    return perms


def gen_documents(con: duckdb.DuckDBPyConnection, dst: Path) -> None:
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    off = max(r[0] for r in rows) + 1
    token_lists = [r[1].split(" ") for r in rows]
    tables: dict[int, list[np.ndarray]] = {}
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    # one row group per copy: bounds peak memory at one corpus copy
    with pq.ParquetWriter(dst / "documents.parquet", schema) as writer:
        for c in range(FACTOR):
            doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
            for (doc_id, text, lang, source), toks in zip(rows, token_lists):
                if c > 0 and len(toks) >= 3:
                    n = len(toks)
                    perms = tables.setdefault(n, _perm_table(n))
                    p = perms[(c - 1) % len(perms)]
                    text = " ".join(toks[i] for i in p)
                doc_ids.append(doc_id + c * off)
                texts.append(text)
                langs.append(lang)
                sources.append(source)
                n_chars.append(len(text))
            writer.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(doc_ids, pa.int64()),
                        "text": pa.array(texts, pa.string()),
                        "lang": pa.array(langs, pa.string()),
                        "source": pa.array(sources, pa.string()),
                        "n_chars": pa.array(n_chars, pa.int64()),
                    },
                    schema=schema,
                )
            )


def gen_embeddings(con: duckdb.DuckDBPyConnection, dst: Path) -> None:
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    off = max(r[0] for r in rows) + 1
    base = np.asarray([r[1] for r in rows], dtype=np.float32)
    ids = np.asarray([int(r[0]) for r in rows], dtype=np.int64)
    labels = np.asarray([int(r[2]) for r in rows], dtype=np.int32)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    with pq.ParquetWriter(dst / "embeddings.parquet", schema) as writer:
        for c in range(FACTOR):
            mat = base
            if c > 0:  # same perturbation family as gen_sf1 (seeds distinct per copy)
                rng = np.random.RandomState(7 * c + 1)
                mat = (base + rng.normal(0.0, 0.02, base.shape)).astype(np.float32)
            writer.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(ids + c * off, pa.int64()),
                        "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
                        "label": pa.array(labels, pa.int32()),
                    },
                    schema=schema,
                )
            )


def main() -> None:
    dst = (
        Path(sys.argv[1])
        if len(sys.argv) > 1
        else Path(__file__).resolve().parents[1] / ".localdata" / "sf10"
    )
    staging = dst.parent / (dst.name + ".__staging__")
    if staging.exists():
        shutil.rmtree(staging)
    staging.mkdir(parents=True)
    con = duckdb.connect()
    orig_factor = gen_sf1.FACTOR  # restore the SAVED value, not a literal
    gen_sf1.FACTOR = FACTOR  # key-remap machinery is copy-count-safe
    try:
        gen_sf1.gen_relational(con, staging)
    finally:
        gen_sf1.FACTOR = orig_factor
    gen_documents(con, staging)
    gen_embeddings(con, staging)
    for table in ("region", "nation"):
        shutil.copyfile(SRC / f"{table}.parquet", staging / f"{table}.parquet")
    if dst.exists():
        shutil.rmtree(dst)
    staging.rename(dst)
    for f in sorted(dst.glob("*.parquet")):
        (n,) = duckdb.sql(f"SELECT count(*) FROM read_parquet('{f}')").fetchone()
        print(f"{f.name}: {n:,} rows")
    # invariant check mirroring the r10 gen_sf1 fix: duplicate texts may
    # only come from the baseline's own intentional duplicates replicated
    # WITHIN each copy (same-n docs share a copy's permutation, so
    # within-copy duplicate structure is preserved exactly); cross-copy
    # collisions would add excess beyond FACTOR x the baseline's
    def _excess(path: str) -> int:
        (e,) = duckdb.sql(
            f"SELECT count(*) - count(DISTINCT text) FROM read_parquet('{path}')"
        ).fetchone()
        return int(e)

    base, scaled = _excess(f"{SRC}/documents.parquet"), _excess(f"{dst}/documents.parquet")
    print(f"duplicate-text excess: baseline {base} x {FACTOR} = {base * FACTOR}, sf10 {scaled}")
    if scaled != base * FACTOR:
        print("WARNING: cross-copy text collisions present", file=sys.stderr)


if __name__ == "__main__":
    main()
