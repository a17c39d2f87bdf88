"""Sketch-based table profiling — the 100 TB complement of the exact
``table_profile`` catalog query.

Exact COUNT(DISTINCT) and exact percentiles are full-shuffle operators: the
distinct needs every value co-located and the percentile a global sort. At
profiling time on a 100 TB fact table you want the sketch versions instead —
HyperLogLog++ (``approx_count_distinct``, mergeable fixed-size registers)
and the Greenwald-Khanna quantile sketch (``percentile_approx``) — which
aggregate map-side into kilobyte-sized state and cost one scan for any
number of columns.

Sketches are estimates, so they cannot sit behind the exact-hash oracle
gate; their accuracy contract is pinned by ``tests/test_operators.py``
instead (observed error vs exact within the configured bounds on the
fixtures). Use exact ``table_profile`` for correctness checks and this for
operational profiling at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_profile(
    df: DataFrame,
    cols: Sequence[str],
    rsd: float = 0.05,
    percentiles: Sequence[float] = (0.5, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """One-row profile of ``cols``: a total ``n_rows`` plus, per column,
    the non-null count and min/max (exact — they are cheap partial
    aggregates), HLL++ distinct estimate at relative standard deviation
    ``rsd``, and GK quantile estimates at ``1/accuracy`` rank error. Null
    count per column = ``n_rows - <col>__n_nonnull``, derivable without a
    second scan. Single scan, single reduce, O(KB) state per column
    regardless of table size."""
    from pyspark.sql import types as T

    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.NumericType, T.DateType, T.TimestampType))
    }
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n_nonnull"),
            F.min(F.col(c)).alias(f"{c}__min"),
            F.max(F.col(c)).alias(f"{c}__max"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__approx_distinct"),
        ]
        # GK quantiles are numeric/temporal-only; a string column must not
        # abort the whole profile at analysis (review r12) — it still gets
        # count/min/max/HLL above
        if c in numeric:
            aggs.append(
                F.percentile_approx(c, list(percentiles), accuracy).alias(
                    f"{c}__percentiles"
                )
            )
    return df.agg(*aggs)
