"""Security-master SCD lifecycle (SURVEY §2.11, L1-L5).

Parity targets (paths relative to /root/reference/):
- L1 first_seen frozen / last_seen advanced on conflict:
  01_master_sync/04_master_list_loader.py:55-85
- L2 initial status 'new': src/utils/status_manager.py:25-30
- L3 active -> inactive when last_seen < now - 7d: status_manager.py:63-74
  (INACTIVE_THRESHOLD_DAYS = 7, status_manager.py:13)
- L4 new -> active when a real name arrived: status_manager.py:76-88
- L5 row-level predicates: status_manager.py:32-57

All transitions are conditional column rewrites — a narrow table rewrite on
Parquet, an UPDATE on a transactional format. No shuffles: the transforms
are per-row (map-only), so they scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INACTIVE_THRESHOLD_DAYS = 7  # status_manager.py:13


def assign_initial_status(df: DataFrame, status_col: str = "status") -> DataFrame:
    """L2: incoming rows with no status become 'new'."""
    return df.withColumn(status_col, F.coalesce(F.col(status_col), F.lit("new")))


def should_promote_to_active(name: Column | str = "name", status: Column | str = "status") -> Column:
    """L5/L4 predicate: 'new' row whose name is real (not blank / 'N/A')."""
    n = F.col(name) if isinstance(name, str) else name
    s = F.col(status) if isinstance(status, str) else status
    return (s == "new") & n.isNotNull() & (F.trim(n) != "") & (F.upper(F.trim(n)) != "N/A")


def should_mark_inactive(
    last_seen: Column | str = "last_seen",
    status: Column | str = "status",
    today: Column | None = None,
    threshold_days: int = INACTIVE_THRESHOLD_DAYS,
) -> Column:
    """L5/L3 predicate: active entity unseen for more than the grace period."""
    ls = F.col(last_seen) if isinstance(last_seen, str) else last_seen
    s = F.col(status) if isinstance(status, str) else status
    today = F.current_date() if today is None else today
    return (s == "active") & (ls < F.date_sub(today, threshold_days))


def apply_status_transitions(
    df: DataFrame,
    today: Column | None = None,
    threshold_days: int = INACTIVE_THRESHOLD_DAYS,
) -> DataFrame:
    """L3 + L4 in one pass, stamping updated_at only on changed rows."""
    promote = should_promote_to_active()
    expire = should_mark_inactive(today=today, threshold_days=threshold_days)
    new_status = (
        F.when(expire, F.lit("inactive"))
        .when(promote, F.lit("active"))
        .otherwise(F.col("status"))
    )
    changed = ~new_status.eqNullSafe(F.col("status"))
    out = df.withColumn("__new_status", new_status)
    if "updated_at" in df.columns:
        out = out.withColumn(
            "updated_at", F.when(changed, F.current_timestamp()).otherwise(F.col("updated_at"))
        )
    return out.withColumn("status", F.col("__new_status")).drop("__new_status")


def stamp_first_last_seen(df: DataFrame, as_of: Column | None = None) -> DataFrame:
    """L1 (source side): a fresh batch carries first_seen = last_seen = as_of;
    the merge preserves target.first_seen on matched rows."""
    as_of = F.current_date() if as_of is None else as_of
    return df.withColumn("first_seen", as_of.cast("date")).withColumn("last_seen", as_of.cast("date"))
