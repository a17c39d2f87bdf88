"""General as-of join operator (pandas ``merge_asof`` parity, Spark-first).

The catalog query ``asof_last_click_before_purchase``
(queries/advanced.py) is the fixed-shape instance; this is the reusable
library form: LEFT as-of semantics over arbitrary key/order/value columns,
backward or forward direction, optional tolerance.

Implementation is the scalable union + window-LOCF pattern, NOT a range
join: both sides are unioned with a side tag, one shuffle partitions by
the equi-keys, and a running ``last(..., ignorenulls=True)`` carries the
most recent right-side row onto each left row. Cost is a single shuffle +
sort regardless of time-range width; a range join would explode with the
match window. At 100 TB the shuffle is on the by-keys — salting applies if
one entity dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """LEFT as-of join: each ``left`` row gets the nearest ``right`` row.

    - ``on``: ordering column present on both sides (timestamp or numeric).
    - ``by``: equi-join keys (the shuffle keys).
    - ``value_cols``: right-side columns to carry over (default: everything
      except ``on``/``by``), each emitted as ``<name><suffix>``; the
      matched right ``on`` value is emitted as ``<on><suffix>``.
    - ``direction``: ``"backward"`` (right.on <= left.on, the common case)
      or ``"forward"`` (right.on >= left.on). Exact ties match in both
      directions, like ``merge_asof``.
    - ``tolerance``: optional max distance as a Column-compatible value in
      the ``on`` column's difference domain (e.g. ``F.expr("INTERVAL 1
      HOUR")`` for timestamps, a number for numerics); matches farther
      away are nulled out, preserving LEFT semantics.

    NULL handling (merge_asof rejects null keys; this keeps LEFT
    semantics instead): right rows with a null ``on`` OR a null ``by``
    key can never match — they are dropped before the union — and left
    rows with a null ``on`` or null ``by`` key are kept with a null
    match. The ``by`` rule matches SQL equi-join semantics: without it,
    ``Window.partitionBy`` would group all NULL-keyed rows together and
    silently cross-match dirty data. Ties among right rows at the same
    (by, on) are broken deterministically by the greatest value tuple, so
    results are stable across shuffle orders.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, on)]
    value_cols = list(value_cols)
    # merge_asof parity: reject silently-ambiguous output up front instead of
    # emitting duplicate columns or ambiguous struct fields.
    if len(set(value_cols)) != len(value_cols):
        raise ValueError(f"value_cols contains duplicates: {value_cols}")
    overlap = set(value_cols) & {on, *by}
    if overlap:
        raise ValueError(f"value_cols may not contain on/by columns: {sorted(overlap)}")
    reserved = {"__asof_payload", "__asof_side", "__asof_match"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"column names reserved by asof_join: {sorted(clash)}")
    emitted = [f"{on}{suffix}", *[f"{c}{suffix}" for c in value_cols]]
    collide = set(emitted) & set(left.columns)
    if collide:
        raise ValueError(
            f"suffixed output columns collide with left columns: {sorted(collide)}; "
            f"pass a different suffix"
        )
    right = right.filter(F.col(on).isNotNull())
    for k in by:
        # NULL by-keys must not partition together and cross-match (see doc)
        right = right.filter(F.col(k).isNotNull())

    payload = F.struct(F.col(on).alias(on), *[F.col(c).alias(c) for c in value_cols])
    left_cols = left.columns
    r = right.select(
        *by,
        F.col(on),
        payload.alias("__asof_payload"),
        F.lit(0).alias("__asof_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in (*by, on)],
    )
    l = left.select(
        *by,
        F.col(on),
        F.lit(None).cast(r.schema["__asof_payload"].dataType).alias("__asof_payload"),
        F.lit(1).alias("__asof_side"),
        *[F.col(c) for c in left_cols if c not in (*by, on)],
    )
    # side=0 sorts right rows before left at equal `on` => inclusive match.
    # forward = backward over the reversed order. The payload struct is the
    # final sort key: among right rows tied on (by, on), last() then
    # deterministically carries the greatest value tuple regardless of
    # shuffle order (left rows are separated by side first, so their null
    # payloads never interleave).
    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(
            F.col(on).asc(), F.col("__asof_side").asc(), F.col("__asof_payload").asc()
        )
    else:
        w = Window.partitionBy(*by).orderBy(
            F.col(on).desc(), F.col("__asof_side").asc(), F.col("__asof_payload").asc()
        )
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = r.unionByName(l).withColumn(
        "__asof_match",
        # a left row with null `on` has no position in the order; null match
        F.when(F.col(on).isNotNull(), F.last("__asof_payload", ignorenulls=True).over(w)),
    )
    out = carried.filter(F.col("__asof_side") == 1)
    match_on = F.col(f"__asof_match.{on}")
    if tolerance is not None:
        dist = (F.col(on) - match_on) if direction == "backward" else (match_on - F.col(on))
        out = out.withColumn(
            "__asof_match", F.when(dist <= tolerance, F.col("__asof_match"))
        )
        match_on = F.col(f"__asof_match.{on}")
    return out.select(
        *by,
        F.col(on),
        *[F.col(c) for c in left_cols if c not in (*by, on)],
        match_on.alias(f"{on}{suffix}"),
        *[F.col(f"__asof_match.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
