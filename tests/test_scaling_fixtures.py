"""Invariants of the WIDE scaling-fixture generator (scripts/gen_sf10_wide.py).

The wide fixture's whole value is one claim: each copy is the base corpus
with its within-copy similarity structure preserved EXACTLY while
cross-copy similarity collapses to background noise (cluster COUNT scales,
cluster SIZE does not — the regime a real 100x corpus exhibits, unlike the
hot gen_sf10 stress fixture). These tests pin that claim at factor=2 over
the real sf0.1 base corpus, driver-free (pure duckdb/numpy — no Spark
session).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))


def test_wide_documents_preserve_within_copy_dup_structure(tmp_path):
    import gen_sf10_wide as W

    con = duckdb.connect()
    W.gen_documents_wide(con, tmp_path, factor=2)
    path = tmp_path / "documents.parquet"
    n_base, excess_base = duckdb.sql(
        f"SELECT count(*), count(*) - count(DISTINCT text) FROM read_parquet('{W.SRC}/documents.parquet')"
    ).fetchone()
    n, excess = duckdb.sql(
        f"SELECT count(*), count(*) - count(DISTINCT text) FROM read_parquet('{path}')"
    ).fetchone()
    assert n == 2 * n_base
    # bijective renaming preserves within-copy text equality exactly and
    # must introduce NO cross-copy collisions
    assert excess == 2 * excess_base
    # token-count (hence shingle-count) profile identical per copy, and the
    # stored n_chars matches the substituted text
    rows = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM read_parquet('{path}') ORDER BY doc_id"
    ).fetchall()
    assert all(len(t) == nc for _, t, nc in rows)
    toks0 = [len(t.split(" ")) for _, t, _ in rows[:n_base]]
    toks1 = [len(t.split(" ")) for _, t, _ in rows[n_base:]]
    assert toks0 == toks1
    # cross-copy shingle overlap is background noise: the copies share no
    # more than a trivial fraction of 3-gram shingles (the hot fixture's
    # token-permuted copies share 100% of token SETS)
    def shingles(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sample = range(0, n_base, max(1, n_base // 50))
    overlaps = []
    for i in sample:
        s0, s1 = shingles(rows[i][1]), shingles(rows[i + n_base][1])
        if s0 or s1:
            overlaps.append(len(s0 & s1) / max(1, len(s0 | s1)))
    assert max(overlaps) < 0.05


def test_wide_embeddings_rotation_preserves_within_copy_cosines(tmp_path):
    import gen_sf10_wide as W

    con = duckdb.connect()
    W.gen_embeddings_wide(con, tmp_path, factor=2)
    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{tmp_path / 'embeddings.parquet'}') ORDER BY vec_id"
    ).fetchnumpy()["embedding"]
    mats = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
    n_base = len(mats) // 2
    a, b = mats[:n_base], mats[n_base:]
    # rotations are isometries: norms and ALL pairwise within-copy cosines
    # survive to float32 round-off
    assert np.allclose(np.linalg.norm(a, axis=1), np.linalg.norm(b, axis=1), rtol=1e-4)
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    k = 200  # full gram on a slice keeps the test sub-second
    assert np.allclose(an[:k] @ an[:k].T, bn[:k] @ bn[:k].T, atol=1e-3)
    # cross-copy cosines are background noise, nowhere near the hot
    # fixture's ~0.99 near-dup regime
    assert np.abs(an @ bn.T).max() < 0.8


def test_wide_documents_disjoint_mode_separates_token_namespaces(tmp_path):
    """disjoint=True must make cross-copy token sets provably disjoint (the
    isolation mode for token-SET-based chains) while preserving within-copy
    duplicate structure exactly, like the permuted default."""
    import gen_sf10_wide as W

    con = duckdb.connect()
    W.gen_documents_wide(con, tmp_path, factor=2, disjoint=True)
    path = tmp_path / "documents.parquet"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{path}') ORDER BY doc_id"
    ).fetchall()
    n_base = len(rows) // 2
    toks0 = {t for _, txt in rows[:n_base] for t in txt.split(" ")}
    toks1 = {t for _, txt in rows[n_base:] for t in txt.split(" ")}
    assert not (toks0 & toks1)
    n, excess = duckdb.sql(
        f"SELECT count(*), count(*) - count(DISTINCT text) FROM read_parquet('{path}')"
    ).fetchone()
    (excess_base,) = duckdb.sql(
        f"SELECT count(*) - count(DISTINCT text) FROM read_parquet('{W.SRC}/documents.parquet')"
    ).fetchone()
    assert n == 2 * n_base and excess == 2 * excess_base
