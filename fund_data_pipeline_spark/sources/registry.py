"""Entity-registry lookups and resume scans (SURVEY §2.1 S8/S10, §2.6 U2).

Parity targets:
- S8 active-entity lookup: src/utils/db_connector.py:353-378 (get_active_tickers)
- S10 resume scan (skip already-processed): 01_yf_fund_nav_scraper.py:59-66,189-190
- U2 gap detection (master minus delivered): 04_sa_history_remediator.py:59-90
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def active_entities(master: DataFrame, source: str | None = None, asset_type: str | None = None) -> DataFrame:
    """S8: tickers with status='active' for a source (optionally one asset type)."""
    df = master.filter(F.col("status") == "active")
    if source is not None:
        df = df.filter(F.col("source") == source)
    if asset_type is not None:
        df = df.filter(F.col("asset_type") == asset_type)
    return df.select("ticker", "asset_type", "name")


def resume_anti_join(targets: DataFrame, done: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """S10/U2: the still-to-process set = targets MINUS done, as a left-anti
    join on the key (never a driver-side Python set)."""
    if keys is None:  # `keys or` would silently remap an explicit [] to the
        keys = ["ticker"]  # ticker grain (review r9) — fail loudly instead
    if not keys:
        raise ValueError("resume_anti_join: keys must be non-empty")
    return targets.join(done.select(*keys).dropDuplicates(keys), keys, "left_anti")
