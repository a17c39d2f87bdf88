"""sf1 verification for ``corpus_dedup_pipeline`` — the 4-stage composed
dedup replayed exactly in Python, completing the sf1 sweep.

The registered oracle composes four stage oracles (including the
recursive minhash-CC closure) and is infeasible at sf1; each stage KERNEL
is already sf1-verified individually (exact dedup by the full-catalog
gate, minhash-CC by ``verify_sf1_clusters.py``, SemDeDup by
``verify_sf1_semantic.py``). This script verifies the COMPOSITION — the
keep semantics and per-stage drop attribution — end to end:

1. exact:    md5(text) groups, keep the lowest doc_id.
2. near_dup: minhash-LSH over survivors — token 3-gram shingles
   (plain-space split, docs under 3 tokens band nothing), per-shingle
   material md5('0|'+s)+md5('1|'+s), 8 hash families = lexicographic min
   of the 8-hex-char chunks, 4 bands of md5(h_a || h_b) — then exact
   union-find connected components with min-label canonicalization (the
   ``verify_sf1_clusters.py`` fixpoint engine); non-minimum cluster
   members drop.
3. semantic: the ``verify_sf1_semantic.py`` replay restricted to stage-2
   survivors (centroids still from the full table — the operator's
   restrict_ids contract); docs without an embedding row pass through.
4. quality:  fingerprint md5(coalesce(lang,'') | text[:32]); composite
   quality score replicated in the engines' exact float operation order;
   keep the (quality DESC, doc_id ASC) best per fingerprint.

Output: one row per document, first dropping stage or keep=True —
compared exactly against the Spark query. Run:
``python scripts/verify_sf1_pipeline.py [sf_dir]`` (default
``.localdata/sf1``). Exit 0 on exact match.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from verify_sf1_clusters import union_find_clusters  # noqa: E402
from verify_sf1_semantic import replay as semantic_replay  # noqa: E402

_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]
_N_HASH = 8


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _minhash_bands(doc_id: int, text: str):
    toks = (text or "").split(" ")
    if len(toks) < 3:
        return
    material = [
        _md5("0|" + " ".join(toks[i : i + 3])) + _md5("1|" + " ".join(toks[i : i + 3]))
        for i in range(len(toks) - 2)
    ]
    sig = [min(m[8 * i : 8 * i + 8] for m in material) for i in range(_N_HASH)]
    for band, (a, b) in enumerate(_BANDS):
        yield band, _md5(sig[a] + sig[b])


def replay(sf_dir: str) -> list[tuple]:
    import pyarrow.parquet as pq

    from fund_data_pipeline_spark.queries.text import STOPWORDS

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    docs = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    emb_ids = set(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .column("vec_id")
        .to_pylist()
    )
    stop = set(STOPWORDS)
    stage: dict[int, str] = {}

    # stage 1: exact content dedup, keep lowest id per md5(text)
    keeper: dict[str, int] = {}
    for doc_id, text, _ in docs:  # docs ascend by id -> first seen is keeper
        keeper.setdefault(_md5(text or ""), doc_id)
    surv1 = []
    for doc_id, text, lang in docs:
        if keeper[_md5(text or "")] != doc_id:
            stage[doc_id] = "exact"
        else:
            surv1.append((doc_id, text, lang))

    # stage 2: minhash-LSH -> union-find CC, keep min id per cluster
    buckets: dict[tuple, list[int]] = {}
    for doc_id, text, _ in surv1:
        for key in _minhash_bands(doc_id, text):
            buckets.setdefault(key, []).append(doc_id)
    edges = set()
    for members in buckets.values():
        lo = min(members)
        for m in members:
            if m != lo:
                edges.add((lo, m))  # star edges suffice for a shared bucket
    nodes = [d for d, _, _ in surv1]
    clusters = union_find_clusters(nodes, sorted(edges))
    member_root = {}
    for root, members in clusters.items():
        for m in members:
            member_root[m] = root
    surv2 = []
    for doc_id, text, lang in surv1:
        if member_root[doc_id] != doc_id:
            stage[doc_id] = "near_dup"
        else:
            surv2.append((doc_id, text, lang))

    # stage 3: SemDeDup restricted to survivors with an embedding row
    restrict = {d for d, _, _ in surv2 if d in emb_ids}
    dropped3 = {row[0] for row in semantic_replay(sf_dir, restrict_ids=restrict)}
    surv3 = []
    for doc_id, text, lang in surv2:
        if doc_id in dropped3:
            stage[doc_id] = "semantic"
        else:
            surv3.append((doc_id, text, lang))

    # stage 4: quality-ranked fingerprint dedup — exact float op order
    groups: dict[str, list[tuple[float, int]]] = {}
    for doc_id, text, lang in surv3:
        text = text or ""
        fp = _md5((lang or "") + "|" + text[:32])
        toks = text.split(" ")
        n = len(toks)
        stop_ratio = float(sum(1 for tk in toks if tk in stop)) / n
        avg_len = float(len(text.replace(" ", ""))) / n
        q = (
            0.5 * (1.0 if 30 <= n <= 400 else 0.0)
            + 0.3 * min(stop_ratio * 10.0, 1.0)
            + 0.2 * (1.0 if 3.0 <= avg_len <= 8.0 else 0.0)
        )
        groups.setdefault(fp, []).append((q, doc_id))
    for rows in groups.values():
        rows.sort(key=lambda r: (-r[0], r[1]))
        for _, doc_id in rows[1:]:
            stage[doc_id] = "quality"

    return sorted(
        (doc_id, stage.get(doc_id), doc_id not in stage) for doc_id, _, _ in docs
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".localdata" / "sf1")
    want = replay(sf_dir)
    n_drop = sum(1 for r in want if not r[2])
    print(f"python replay: {len(want)} docs, {n_drop} dropped")

    from fund_data_pipeline_spark.queries import QUERIES
    from fund_data_pipeline_spark.session import get_spark

    spark = get_spark("verify_sf1_pipeline")
    got = sorted(
        (r.doc_id, r.drop_stage, r.keep)
        for r in QUERIES["corpus_dedup_pipeline"].spark(spark, sf_dir).collect()
    )
    if got == want:
        print(f"PASS corpus_dedup_pipeline@{sf_dir}: {len(got)} verdicts match exactly")
        return 0
    only_want = set(want) - set(got)
    only_got = set(got) - set(want)
    print(f"FAIL: {len(only_want)} rows only in replay, {len(only_got)} only in Spark")
    for row in sorted(only_want, key=str)[:5]:
        print("  replay-only:", row)
    for row in sorted(only_got, key=str)[:5]:
        print("  spark-only :", row)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
