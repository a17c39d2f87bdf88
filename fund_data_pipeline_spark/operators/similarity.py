"""Arrow-vectorized similarity search: the throughput path for dense scans.

The expression-based cosine in :mod:`..queries.vectors` stays JVM-side and
is ideal when similarity is one column among many. When the job IS the
similarity scan (rank 100 TB of embeddings against a probe), a numpy batch
kernel over ``mapInPandas`` wins: one BLAS-ish matrix-vector product per
Arrow batch instead of per-element codegen, and per-batch PARTIAL top-k so
only k rows per partition ever reach the final ordering.

Correctness contract: identical quantization to the SQL/JVM path
(round(x*1e6) as int64, exact integer dot/norms, one double division at the
end), so the catalog query ``embedding_topk_pandas`` is value-hash-checked
against the same DuckDB oracle as the JVM variant — the Arrow path itself
sits under the correctness gate.

Scale notes:
- partial top-k per batch bounds the shuffle to k rows x n_partitions;
  the final exact ordering sorts a few hundred rows, never the corpus.
- the probe vector rides in the closure (tiny); for probe BATCHES, extend
  the kernel to a matrix-matrix product per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

def _round_half_away(a):
    """round() as Spark/DuckDB do it: half away from zero (np.round is
    half-to-even, which disagrees on exact .5 fractions)."""
    import numpy as np

    return np.where(a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5)).astype("int64")


_OUT = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("label", T.IntegerType(), True),
        T.StructField("cosine", T.DoubleType(), True),
    ]
)


def topk_cosine(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 20,
    exclude_vec_id: int | None = None,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of ``query_vec``, Arrow-batched."""
    import numpy as np

    q = _round_half_away(np.asarray(list(query_vec), dtype="float64") * 1e6)
    qnorm = float(np.sqrt(float((q * q).sum())))

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            # widen float32 -> float64 BEFORE scaling, exactly as Spark's
            # float->double promotion does; quantizing at single precision
            # would round differently
            mat = _round_half_away(np.stack(pdf[vec_col].to_numpy()).astype("float64") * 1e6)
            dots = mat @ q
            norms = np.sqrt((mat * mat).sum(axis=1).astype("float64"))
            cos = dots.astype("float64") / (norms * qnorm)
            out = pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "label": pdf[label_col].to_numpy(),
                    "cosine": cos,
                }
            )
            # partial top-k: only k candidates per batch survive the shuffle
            out = out.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
            yield out

    src = emb
    if exclude_vec_id is not None:
        src = src.filter(F.col(id_col) != exclude_vec_id)
    partial = src.select(id_col, label_col, vec_col).mapInPandas(kernel, _OUT)
    return partial.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)
