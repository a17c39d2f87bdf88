"""Exact DECIMAL→DOUBLE conversion kernels for the exact-aggregation queries.

This is the repo's one numerically delicate conversion, kept in ONE place:
a direct ``CAST(decimal_sum AS DOUBLE)`` (or a cast-then-divide) is only
magnitude-coincidentally equal across engines — DuckDB's DECIMAL(p,s>0)
cast of a >2^53 sum is 1 ULP off Spark's correctly-rounded
``BigDecimal.doubleValue``. Both kernels below decompose into halves that
are correctly rounded in BOTH engines at any magnitude (verified
exhaustively over all fraction numerators at scales 2/4/6 and at >2^53
integer parts), recombined with a single IEEE add neither engine fuses.
Oracle twins: ``CAST(FLOOR(s) AS DOUBLE) + CAST(s - FLOOR(s) AS DOUBLE)``.
Consumers: pricing_summary, price_quantity_stats,
incremental_rollup_revenue.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col, prec: int = 18, scale: int = 2) -> Column:
    """Shared money-column DECIMAL cast — the exact-aggregation input form
    used across the query modules (one definition so precision can't drift)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def split_integer_total(total: Column, scale: int) -> Column:
    """Exact integer total (a DECIMAL(38,0) sum of value×``scale`` units,
    e.g. cents) → the DOUBLE of ``total/scale``: integer part via exact
    subtraction+division (decimal arithmetic, then one correctly-rounded
    cast), remainder as one exact division of sub-``scale`` integers.

    The remainder is the FLOOR-style (always non-negative) residue, not
    Spark's sign-of-dividend ``%``: the oracle twin is a FLOOR-split, and a
    truncation-split diverges from it by 1 ULP on NEGATIVE totals (review
    r9 — latent while all consumers sum positive measures, but the kernel
    must hold for signed sums like returns/deltas)."""
    r = ((total % F.lit(scale)) + F.lit(scale)) % F.lit(scale)
    whole = ((total - r) / F.lit(scale)).cast("decimal(38,0)")
    return whole.cast("double") + r.cast("double") / F.lit(float(scale))


def split_scaled_decimal(c: Column) -> Column:
    """Scaled DECIMAL(p,s>0) value → DOUBLE: floor and sub-1 fraction cast
    separately (each correctly rounded in both engines), one IEEE add."""
    return F.floor(c).cast("double") + (c - F.floor(c)).cast("double")
