"""Connected components for dedup clustering (iterative label propagation).

The last stage of a fuzzy-dedup pipeline: LSH blocking yields candidate
*pairs*, but keep/drop decisions need *clusters* (A~B, B~C => {A,B,C} even
when A,C never collide). Cluster id = min node id reachable through the
edge set — computed by min-label propagation to a fixpoint:

    label(v) <- min(label(v), min over neighbors u of label(u))

Each iteration is one shuffle (edges join labels + min-aggregate); the loop
runs until no label changes, i.e. graph-diameter iterations. Near-dup
graphs are unions of small dense blobs (diameter 2-4), so 3-5 iterations
is typical regardless of row count — this is the standard large-scale
design (cf. the large/small-star algorithm of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14; plain propagation is the
right trade-off at small diameter).

Scale notes:
- ``localCheckpoint`` truncates the lineage each round, keeping the plan
  O(1) instead of O(iterations) (classic iterative-algorithm pitfall).
- The driver sees only a changed-row *count* per round — no row data.
- Edges are symmetrized once up front; the per-round join shuffles on the
  node id, so pre-partitioning labels and edges on that key makes every
  round's shuffle a cheap co-partitioned join on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 50,
    strict: bool = True,
) -> DataFrame:
    """Return (node, cluster_id): min reachable node id per component.

    ``nodes``: one row per node id (singletons allowed — they become their
    own cluster). ``edges``: undirected pairs; symmetrized internally.

    Min-label propagation needs ~graph-diameter rounds; if the loop exhausts
    ``max_iterations`` before the fixpoint (e.g. a pathological long chain),
    the labels are NOT converged — components would be silently split. With
    ``strict=True`` (default) that raises; ``strict=False`` downgrades to a
    warning for callers that accept approximate clusters.
    """
    import warnings
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=False)

    labels = nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("label"))

    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
                (F.col("nbr_label") < F.col("label")).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if n_changed == 0:
            converged = True
            break

    if not converged:
        msg = (
            f"connected_components did not reach a fixpoint within "
            f"{max_iterations} iterations — cluster ids would be split. "
            f"Raise max_iterations (needs ~graph diameter rounds)."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)

    return labels.withColumnRenamed("label", "cluster_id")
