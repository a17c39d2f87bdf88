"""Time-series densification: daily date-spine gap fill with LOCF carry.

The position-carry / bar-filling operator behind the ``calendar_gap_fill``
catalog query, factored out so the span can be bounded: the catalog form
densifies each key's full [first, last] observation range (the
oracle-checkable definition), while a production pipeline caps the spine
at the trailing ``last_n_days`` — a customer with a 10-year history must
cost N spine rows, not 3,650.

Scale shape: the spine is generated MAP-SIDE (``sequence``/``explode``
over the per-key span row), the only shuffles are the span aggregation
and one keyed window for the LOCF carry. With ``last_n_days`` set, the
carry-in seed (the last observation at-or-before the capped start) is
computed from the OBSERVATION rows only — the untruncated spine is never
materialized anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(
    daily: DataFrame,
    keys: Sequence[str],
    date_col: str,
    value_col: str,
    last_n_days: int | None = None,
) -> DataFrame:
    """Densify ``daily`` (one row per key+date, dates of type DATE) onto a
    complete per-key daily spine and forward-fill ``value_col``.

    Returns one row per key per spine day: ``(*keys, date_col, value_col,
    carried)`` where ``value_col`` is NULL on gap days and ``carried`` is
    the last non-null observation at or before that day.

    ``last_n_days`` bounds each key's spine to its trailing N days
    (``[max(first, last - N + 1), last]``). Days before the cap still
    seed the carry: the newest observation at-or-before the capped start
    is joined back per key, so ``carried`` on an in-range gap day is
    identical to what the unbounded spine would produce.

    Keys must be non-NULL (review r12): a NULL key groups into its own
    span row but the spine-observation equi-join drops it (SQL equality,
    matching the calendar_gap_fill oracle's join semantics), so its spine
    days would all read as gaps. Filter or sentinel-fill NULL keys first.
    """
    keys = list(keys)
    if last_n_days is not None and last_n_days < 1:
        raise ValueError(f"last_n_days must be >= 1, got {last_n_days}")
    # same reserved-name contract as merge_as_dataframe / diff_frames: an
    # input that already carries an internal column would produce an
    # ambiguous/duplicate column in the spans-spine join (review r9)
    reserved = {"__d0", "__d1", "__rn", "__seed", "carried"}
    clash = reserved & set(daily.columns)
    if clash:
        raise ValueError(f"column names reserved by gap_fill_locf: {sorted(clash)}")
    spans = daily.groupBy(keys).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    if last_n_days is not None:
        spans = spans.withColumn(
            "__d0",
            F.greatest(F.col("__d0"), F.date_sub(F.col("__d1"), last_n_days - 1)),
        )
        # two consumers in the capped branch (the spine explode and the
        # carry-in seed join) — pin the |keys|-sized relation so the
        # full-scan aggregate behind it runs once, not once per consumer
        # (review r10; same rule as temperature_sample's counts relation).
        # persist(), not localCheckpoint: no iteration needs lineage
        # truncation, and persisted blocks recompute after executor loss
        # where checkpoint blocks would kill the job (review r12, the
        # apply_changes/scrub_boilerplate rationale)
        spans = spans.persist()
    spine = spans.select(
        *keys,
        F.col("__d0"),
        F.explode(F.sequence("__d0", "__d1", F.expr("interval 1 day"))).alias(date_col),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = spine.join(daily, [*keys, date_col], "left").select(
        *keys,
        F.col("__d0"),
        F.col(date_col),
        F.col(value_col),
        F.last(value_col, ignorenulls=True).over(w).alias("carried"),
    )
    if last_n_days is None:
        return filled.drop("__d0")
    # carry-in across the cap: newest NON-NULL observation at-or-before the
    # capped start, from observation rows only (tiny relative to any
    # spine). The null filter mirrors the in-spine LOCF's ignorenulls —
    # a NULL observation must not mask an older real value.
    ws = Window.partitionBy(*keys).orderBy(F.col(date_col).desc())
    seed = (
        daily.join(spans.select(*keys, "__d0"), keys)
        .filter(F.col(date_col) < F.col("__d0"))
        .filter(F.col(value_col).isNotNull())
        .withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col(value_col).alias("__seed"))
    )
    return (
        filled.join(seed, keys, "left")
        .withColumn("carried", F.coalesce("carried", "__seed"))
        .drop("__seed", "__d0")
    )
