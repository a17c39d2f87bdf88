"""Generate a WIDE local sf10 fixture: 100x sf0.1 in the realistic regime
where near-dup cluster COUNT grows and cluster SIZE stays constant.

Why this exists (r12 verdict / SCALING.md): `gen_sf10.py`'s fixture is a
deliberate 100-way hot-cluster STRESS — its token-multiset-preserving
permutations leave token-set signatures (simhash) identical across all 100
copies, and its noise-perturbed embeddings are genuine ~0.99-cosine
near-dups of each base vector — so every pair-generating dedup chain at
sf10 evaluates ~100x sf1's candidate pairs (simhash: ~2.7 BILLION). That is
a workload shape no real 100x corpus exhibits: real corpora grow cluster
count at roughly constant cluster size. This generator builds that linear
regime so the three heavy chains can be MEASURED at the fourth decade
instead of argued:

- documents: copy c applies a seeded BIJECTIVE token substitution (a
  permutation of the base corpus vocabulary). Renaming tokens bijectively
  preserves every within-copy similarity the chains consume EXACTLY —
  exact-duplicate groups, shingle sets' Jaccard (hence MinHash bands),
  token sets (hence simhash distances between same-copy docs), token/char
  length stats — while making cross-copy shingle or token-set collisions
  no more likely than between unrelated documents. Cluster structure is
  therefore the base corpus's, replicated 100x: count scales, size does
  not.
- embeddings: copy c applies a seeded ORTHOGONAL rotation (QR of a random
  normal matrix). Rotations preserve norms and within-copy cosines
  exactly, and map the copy onto a uniformly random orientation, so
  cross-copy cosines concentrate around 0 (std ~ 1/sqrt(d) = 0.125 at
  d=64) instead of the hot fixture's 0.99.
- relational tables: hard-linked from the hot sf10 fixture (identical
  workload; the chains never read them, but the harness's
  complete-table-set gate applies to every SF dir).

IDs are offset per copy exactly like gen_sf10 (pure integer multiples).
Size: ~1.8 GB under ``.localdata/sf10wide`` (gitignored, regenerable).
Run: ``python scripts/gen_sf10_wide.py [dst] [link_src] [factor] [disjoint]``
(defaults ``.localdata/sf10wide``, ``.localdata/sf10``, 100; generate sf10
first — factor 10 with an sf1 link-source builds the sf1-wide middle point;
the literal ``disjoint`` as the 4th arg namespaces per-copy tokens, see
``gen_documents_wide``).
"""

from __future__ import annotations

import os
import re
import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
import gen_sf1  # noqa: E402  (shared SRC constant)

SRC = gen_sf1.SRC
FACTOR = 100  # default; override with argv[3] (e.g. 10 for an sf1-wide middle point)


def gen_documents_wide(
    con: duckdb.DuckDBPyConnection, dst: Path, factor: int = FACTOR, disjoint: bool = False
) -> None:
    """``disjoint=True`` suffixes every copy-c token with ``~c`` instead of
    permuting the shared vocabulary. The permuted form keeps the GLOBAL
    vocabulary fixed (realistic for vocabulary-sized operators), but a
    shared vocabulary lets low-diversity documents from different copies
    coincide on their token SETS by pigeonhole — measured r13: cross-copy
    simhash pairs grow quadratically in copy count (645 M candidate pairs
    at factor=100 vs ~10 M from within-copy structure alone). The disjoint
    form makes cross-copy token sets provably non-overlapping, isolating
    the pure cluster-count-x-factor regime for token-SET-based chains;
    within-copy structure is preserved exactly either way."""
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    off = max(r[0] for r in rows) + 1
    token_lists = [r[1].split(" ") for r in rows]
    vocab = sorted({t for toks in token_lists for t in toks})
    tok_idx = {t: i for i, t in enumerate(vocab)}
    vocab_arr = np.asarray(vocab, dtype=object)
    if disjoint:
        # the disjointness guarantee needs the suffix separator absent from
        # the BASE vocabulary — a base token literally ending in '~<c>'
        # would collide with copy c's namespace (ADVICE r13) — so assert it
        # rather than depend on the current corpus's luck. Only the
        # documented collision form ('~<digits>' at END of token) is
        # rejected; a mid-token '~' is harmless (ADVICE r14 narrowed the
        # blanket '~ anywhere' guard)
        clash = [t for t in vocab if re.search(r"~\d+$", t)]
        if clash:
            raise SystemExit(
                f"gen_sf10_wide: disjoint mode needs a '~'-free base "
                f"vocabulary; found {len(clash)} tokens, e.g. {clash[:3]!r}"
            )
    # index-encode once; per copy a single fancy-index + join per document
    idx_lists = [np.asarray([tok_idx[t] for t in toks], dtype=np.int64) for toks in token_lists]
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    with pq.ParquetWriter(dst / "documents.parquet", schema) as writer:
        for c in range(factor):
            if c == 0:
                mapped = vocab_arr
            elif disjoint:
                # per-copy token namespace: cross-copy token sets disjoint
                # by construction (base vocabulary asserted '~'-free above)
                mapped = np.asarray([f"{t}~{c}" for t in vocab], dtype=object)
            else:
                # bijective: a permutation of the vocabulary itself, so the
                # global token set (and thus vocabulary-sized operators
                # like BPE) sees the same Heaps'-law-flat vocabulary a
                # real 100x corpus roughly would
                mapped = vocab_arr[np.random.RandomState(20_003 + c).permutation(len(vocab))]
            doc_ids, texts, n_chars = [], [], []
            for (doc_id, _text, _lang, _source), idx in zip(rows, idx_lists):
                t = " ".join(mapped[idx])
                doc_ids.append(doc_id + c * off)
                texts.append(t)
                n_chars.append(len(t))
            writer.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(doc_ids, pa.int64()),
                        "text": pa.array(texts, pa.string()),
                        "lang": pa.array([r[2] for r in rows], pa.string()),
                        "source": pa.array([r[3] for r in rows], pa.string()),
                        "n_chars": pa.array(n_chars, pa.int64()),
                    },
                    schema=schema,
                )
            )


def gen_embeddings_wide(con: duckdb.DuckDBPyConnection, dst: Path, factor: int = FACTOR) -> None:
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    off = max(r[0] for r in rows) + 1
    base = np.asarray([r[1] for r in rows], dtype=np.float64)
    ids = np.asarray([int(r[0]) for r in rows], dtype=np.int64)
    labels = np.asarray([int(r[2]) for r in rows], dtype=np.int32)
    d = base.shape[1]
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    with pq.ParquetWriter(dst / "embeddings.parquet", schema) as writer:
        for c in range(factor):
            if c == 0:
                mat = base
            else:
                q, r = np.linalg.qr(np.random.RandomState(30_011 + c).normal(size=(d, d)))
                # canonicalize the QR sign ambiguity so the rotation is a
                # deterministic function of the seed across BLAS builds
                mat = base @ (q * np.sign(np.diag(r)))
            writer.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(ids + c * off, pa.int64()),
                        "embedding": pa.array(mat.astype(np.float32).tolist(), pa.list_(pa.float32())),
                        "label": pa.array(labels, pa.int32()),
                    },
                    schema=schema,
                )
            )


def main() -> None:
    dst = (
        Path(sys.argv[1])
        if len(sys.argv) > 1
        else Path(__file__).resolve().parents[1] / ".localdata" / "sf10wide"
    )
    sf10 = (
        Path(sys.argv[2])
        if len(sys.argv) > 2
        else Path(__file__).resolve().parents[1] / ".localdata" / "sf10"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else FACTOR
    disjoint = len(sys.argv) > 4 and sys.argv[4] == "disjoint"
    if not sf10.exists():
        print(f"hot sf10 fixture missing at {sf10}; run scripts/gen_sf10.py first", file=sys.stderr)
        sys.exit(2)
    staging = dst.parent / (dst.name + ".__staging__")
    if staging.exists():
        shutil.rmtree(staging)
    staging.mkdir(parents=True)
    con = duckdb.connect()
    gen_documents_wide(con, staging, factor, disjoint)
    gen_embeddings_wide(con, staging, factor)
    for f in sorted(sf10.glob("*.parquet")):
        if f.name in ("documents.parquet", "embeddings.parquet"):
            continue
        try:  # hard link: the relational tables are byte-identical by design
            os.link(f, staging / f.name)
        except OSError:
            shutil.copyfile(f, staging / f.name)
    if dst.exists():
        shutil.rmtree(dst)
    staging.rename(dst)
    for f in sorted(dst.glob("*.parquet")):
        (n,) = duckdb.sql(f"SELECT count(*) FROM read_parquet('{f}')").fetchone()
        print(f"{f.name}: {n:,} rows")
    # invariants: (1) duplicate-text excess must be exactly factor x the
    # baseline's own intentional duplicates (bijective renaming preserves
    # within-copy equality; cross-copy text collisions would inflate it);
    # (2) a seeded cross-copy cosine sample must stay far below the
    # within-copy near-dup regime (~0.99 in the hot fixture)
    def _excess(path: str) -> int:
        (e,) = duckdb.sql(
            f"SELECT count(*) - count(DISTINCT text) FROM read_parquet('{path}')"
        ).fetchone()
        return int(e)

    base_e, wide_e = _excess(f"{SRC}/documents.parquet"), _excess(f"{dst}/documents.parquet")
    print(f"duplicate-text excess: baseline {base_e} x {factor} = {base_e * factor}, wide {wide_e}")
    if wide_e != base_e * factor:
        print("WARNING: cross-copy text collisions present", file=sys.stderr)
    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{dst}/embeddings.parquet')"
    ).fetchnumpy()["embedding"]
    mats = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
    n_base = len(mats) // factor
    a, b = mats[:n_base], mats[n_base : 2 * n_base]  # copy 0 vs copy 1
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    cross = np.abs(a @ b.T).max()
    within = np.abs((a @ a.T) - np.eye(n_base)).max()
    print(f"cosine structure: max within-copy (off-diag) {within:.3f}, max cross-copy {cross:.3f}")


if __name__ == "__main__":
    main()
