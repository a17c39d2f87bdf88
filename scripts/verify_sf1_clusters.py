"""sf1 verification for ``dedup_clusters`` — the one catalog query whose
registered DuckDB oracle cannot run at sf1.

The blocker is the oracle's RECURSIVE ``reach`` CTE: it materializes the
full transitive closure as (node, reachable-label) pairs — sum of
cluster-size**2 rows — which is fine at the driver's sf0.01 gate but blows
up DuckDB's fixpoint evaluation at sf1 corpus scale (r9/r10 SCALING.md
exclusion; an unrolled bounded-iteration CTE fares no better because
min-label propagation needs up-to-diameter rounds over the full node
relation per round).

This script verifies the SAME contract a different exact way, per the r10
verdict item 6:

1. DuckDB runs the oracle's OWN non-recursive prefix — the ``sig``/
   ``bands``/``edges`` CTEs, verbatim via
   :func:`queries.text.minhash_bands_sql` — so the candidate-edge relation
   is byte-for-byte the registered oracle's.
2. A from-scratch union-find over (all doc_ids, those edges) replaces the
   recursive CTE. Union-find computes connected components exactly; with
   min-label canonicalization its clusters are definitionally equal to the
   closure the recursive CTE computes, so this is the same oracle with a
   different (linear-memory) fixpoint engine, not a weaker check.
3. The Spark ``dedup_clusters`` result at sf1 must match the replay's
   per-cluster (cluster_id = min doc_id, n_docs, keeper, max) rows
   exactly.

Run: ``python scripts/verify_sf1_clusters.py [sf_dir]`` (default
``.localdata/sf1``). Exit 0 on exact match.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def union_find_clusters(nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, list[int]]:
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-label canonical root
    clusters: dict[int, list[int]] = {}
    for n in nodes:
        clusters.setdefault(find(n), []).append(n)
    return clusters


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".localdata" / "sf1")

    from fund_data_pipeline_spark.oracle import duckdb_connect
    from fund_data_pipeline_spark.queries import QUERIES
    from fund_data_pipeline_spark.queries.text import minhash_bands_sql
    from fund_data_pipeline_spark.session import get_spark

    con = duckdb_connect(sf_dir)
    # the registered oracle's non-recursive prefix, verbatim
    edges = con.execute(
        f"""WITH {minhash_bands_sql()},
edges AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id <> b.doc_id
)
SELECT src, dst FROM edges WHERE src < dst"""
    ).fetchall()
    nodes = [r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()]
    clusters = union_find_clusters(nodes, edges)
    want = sorted(
        (root, len(members), min(members), max(members))
        for root, members in clusters.items()
        if len(members) > 1
    )
    print(f"oracle-edge replay: {len(nodes)} nodes, {len(edges)} edges, "
          f"{len(want)} multi-doc clusters")

    spark = get_spark("verify_sf1_clusters")
    got = sorted(
        (r.cluster_id, r.n_docs, r.keeper_doc_id, r.max_doc_id)
        for r in QUERIES["dedup_clusters"].spark(spark, sf_dir).collect()
    )
    if got == want:
        print(f"PASS dedup_clusters@{sf_dir}: {len(got)} clusters match exactly")
        return 0
    only_want = set(want) - set(got)
    only_got = set(got) - set(want)
    print(f"FAIL: {len(only_want)} clusters only in replay, {len(only_got)} only in Spark")
    for row in list(sorted(only_want))[:5]:
        print("  replay-only:", row)
    for row in list(sorted(only_got))[:5]:
        print("  spark-only :", row)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
