"""End-to-end pipeline flows mirroring the reference orchestrators (SURVEY §3).

Each module rebuilds one reference entry point as a chain of declarative
DataFrame transforms over the library operators. Transform functions are
I/O-free (DataFrame in -> DataFrame out) so they unit-test without a
warehouse; the ``run_*`` entry points add the landing-zone scan on one end
and the hash-guarded merge on the other.

- ``master_sync``    entry point 2: clean -> consolidate -> validate ->
                     hash -> upsert -> status transitions
                     (/root/reference/src/05_db_synchronization/01_master_sync)
- ``daily_nav``      entry point 3: scan+union -> conform -> keep-last dedup
                     -> validation split -> load
                     (.../02_performance_sync, daily NAV chain)
- ``price_history``  bulk path: per-entity scan -> conform -> OHLCV hash ->
                     hash-guarded merge (.../02_performance_sync price chain)
- ``dividends``      dividend chain: conform -> 7-key dedup -> hash -> merge
- ``static_details`` entry point 3b: percent/magnitude parse -> overflow
                     repair -> hash -> merge into info/fees/risk/policy
                     (.../03_detail_sync)
- ``holdings``       holdings + allocations: substring/length guards ->
                     path-date -> dedup -> hash -> merge (.../04_holdings_sync)
- ``repair``         failed-row repair feed (G2/U3): failed subset ->
                     reprocess -> merge back with status='Repaired'
                     (.../02_daily_performance/financial_times/03_ft_nav_repair.py)

The whole reference pipeline (4 subprocess modules, CSV IR between every
stage — main_pipeline.py:16-33) collapses into in-process lazy lineages:
each flow is ~1-2 Spark jobs instead of dozens of file round-trips.
"""

from . import (
    daily_nav,
    dividends,
    holdings,
    master_sync,
    orchestrator,
    price_history,
    repair,
    static_details,
)
from .orchestrator import run_pipeline

__all__ = [
    "daily_nav",
    "dividends",
    "holdings",
    "master_sync",
    "orchestrator",
    "price_history",
    "repair",
    "run_pipeline",
    "static_details",
]
