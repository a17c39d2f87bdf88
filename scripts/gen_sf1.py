"""Generate a local sf1 fixture (10x sf0.1) for three-decade scaling runs.

The driver ships sf0.001/0.01/0.1 (read-only); scaling exponents measured
across two decades leave the third decade asserted, not measured. This
script builds sf1 = 10 key-remapped copies of sf0.1 under
``.localdata/sf1`` (gitignored — a ~1 GB derived artifact, regenerable in
~1 min), preserving every schema and dtype:

- relational tables: copy c shifts each key domain by c * (max_key + 1)
  (customer/orders/lineitem/part/supplier/events), so joins match exactly
  within a copy and never across copies — group-by cardinalities scale the
  way a real 10x corpus would.
- documents: copy c > 0 applies a stride-(c+1) token interleave to each
  text. The token MULTISET (so length, quality, language stats) is
  preserved, but adjacencies — hence shingles and MinHash signatures — are
  destroyed, so replicated texts do NOT register as 10-way near-dup
  clusters and the LSH candidate count scales like a real corpus (~10x),
  not quadratically in the copy factor.
- embeddings: copy c > 0 adds small deterministic per-row noise
  (RandomState(7 * c + 1), sigma=0.02) so vectors are not bit-identical
  across copies; top-k scans scale linearly either way.
- region/nation: bounded dims, copied as-is.

Determinism: pure integer remapping + seeded numpy; re-running produces
byte-identical logical content.

Run: ``python scripts/gen_sf1.py [dst]`` (default ``.localdata/sf1``).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
FACTOR = 10


def gen_relational(con: duckdb.DuckDBPyConnection, dst: Path) -> None:
    offs = {}
    for table, key in [
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("events", "event_id"),
    ]:
        (m,) = con.sql(
            f"SELECT max({key}) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()
        offs[table] = int(m) + 1
    (mu,) = con.sql(
        f"SELECT max(user_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    offs["user"] = int(mu) + 1

    remaps = {
        "customer": {"c_custkey": offs["customer"]},
        "orders": {"o_orderkey": offs["orders"], "o_custkey": offs["customer"]},
        "lineitem": {
            "l_orderkey": offs["orders"],
            "l_partkey": offs["part"],
            "l_suppkey": offs["supplier"],
        },
        "part": {"p_partkey": offs["part"]},
        "supplier": {"s_suppkey": offs["supplier"]},
        "events": {"event_id": offs["events"], "user_id": offs["user"]},
    }
    for table, remap in remaps.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"t.{c} + copies.c * {remap[c]} AS {c}" if c in remap else f"t.{c}"
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {proj} "
            f"FROM read_parquet('{SRC}/{table}.parquet') t "
            f"CROSS JOIN (SELECT unnest(range({FACTOR})) AS c) copies) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )


def _interleave(tokens: list[str], stride: int, rotate: int = 0) -> list[str]:
    """Non-identity stride interleave, disambiguated by a rotation.

    The requested stride is wrapped into [2, n_tokens - 1] so a short
    document can never round-trip to itself (stride >= n is the identity
    permutation — review r9: copy 9 at stride 10 reproduced every 10-token
    document byte-identically). The wrap makes two COPIES collide when
    their strides wrap to the same value (ADVICE r9: n=10 docs, strides 2
    and 10 both wrap to 2), so the copy index is mixed in as a leading
    rotation: rotations by distinct ``rotate % n`` are distinct
    permutations, and composing a fixed stride permutation with distinct
    rotations stays distinct. Exhaustively checked for FACTOR=10: all
    nine copies are pairwise-distinct permutations for every n >= 5 —
    hence everywhere in this data (min doc length 10). Residual
    collisions exist only at n=3 (c and c+3: stride is pinned to 2 and
    the rotation has period 3 — only 3 distinct outputs exist for 9
    copies, pigeonhole) and n=4 (c and c+4); documents under 3 tokens
    have no non-identity option (and no shingles), so they pass through.
    An identity-composition guard keeps the no-self-duplicate invariant
    unconditional."""
    n = len(tokens)
    if n < 3:
        return tokens
    stride = 2 if n == 3 else 2 + (stride - 2) % (n - 2)
    r = rotate % n
    rotated = tokens[r:] + tokens[:r]
    out: list[str] = []
    for start in range(stride):
        out.extend(rotated[start::stride])
    if out == tokens:  # rotation could in principle invert the stride
        out = []
        for start in range(stride):
            out.extend(tokens[start::stride])
    return out


def gen_documents(con: duckdb.DuckDBPyConnection, dst: Path) -> None:
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    off = max(r[0] for r in rows) + 1
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for c in range(FACTOR):
        for doc_id, text, lang, source in rows:
            if c > 0:
                text = " ".join(_interleave(text.split(" "), c + 1, rotate=c))
            doc_ids.append(doc_id + c * off)
            texts.append(text)
            langs.append(lang)
            sources.append(source)
            n_chars.append(len(text))
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(t, dst / "documents.parquet")


def gen_embeddings(con: duckdb.DuckDBPyConnection, dst: Path) -> None:
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    off = max(r[0] for r in rows) + 1
    base = np.asarray([r[1] for r in rows], dtype=np.float32)
    vec_ids, embs, labels = [], [], []
    for c in range(FACTOR):
        mat = base
        if c > 0:
            rng = np.random.RandomState(7 * c + 1)
            mat = (base + rng.normal(0.0, 0.02, base.shape)).astype(np.float32)
        vec_ids.extend(int(r[0]) + c * off for r in rows)
        embs.extend(mat.tolist())
        labels.extend(int(r[2]) for r in rows)
    t = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, dst / "embeddings.parquet")


def main() -> None:
    dst = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(__file__).resolve().parents[1] / ".localdata" / "sf1"
    # stage-then-rename: an interrupted run must not leave a partial dir
    # that downstream existence checks mistake for a complete fixture
    staging = dst.parent / (dst.name + ".__staging__")
    if staging.exists():
        shutil.rmtree(staging)
    staging.mkdir(parents=True)
    con = duckdb.connect()
    gen_relational(con, staging)
    gen_documents(con, staging)
    gen_embeddings(con, staging)
    for table in ("region", "nation"):
        shutil.copyfile(SRC / f"{table}.parquet", staging / f"{table}.parquet")
    if dst.exists():
        shutil.rmtree(dst)
    staging.rename(dst)
    for f in sorted(dst.glob("*.parquet")):
        (n,) = duckdb.sql(f"SELECT count(*) FROM read_parquet('{f}')").fetchone()
        print(f"{f.name}: {n} rows")


if __name__ == "__main__":
    main()
