"""Fixed target schemas for the 10 staging tables.

The reference declares these as Postgres DDL (parity source:
/root/reference/src/utils/db_connector.py:73-347). Here each is a
``StructType`` constant; natural keys (the UNIQUE constraints that drive
the upserts) are declared alongside so merge/dedup code shares one source
of truth. Surrogate SERIAL ids are dropped — identity comes from the
natural key. ``updated_at`` is stamped at write time and excluded from
row hashes (as in the reference).
"""

from __future__ import annotations

from pyspark.sql import types as T

_AUDIT = [
    T.StructField("row_hash", T.StringType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
]


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
D = T.DateType()
TS = T.TimestampType()


def dec(p: int, s: int) -> T.DecimalType:
    return T.DecimalType(p, s)


# --- stg_security_master (db_connector.py:73-95) -------------------------
SECURITY_MASTER = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("name", S),
        _f("status", S),
        _f("first_seen", D),
        _f("last_seen", D),
        *_AUDIT,
    ]
)
SECURITY_MASTER_KEY = ["ticker", "asset_type", "source"]

# --- stg_price_history (db_connector.py:97-124) ---------------------------
PRICE_HISTORY = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("date", D, False),
        _f("open", dec(18, 4)),
        _f("high", dec(18, 4)),
        _f("low", dec(18, 4)),
        _f("close", dec(18, 4)),
        _f("adj_close", dec(18, 4)),
        _f("volume", T.LongType()),
        _f("name", S),
        _f("status", S),
        *_AUDIT,
    ]
)
PRICE_HISTORY_KEY = ["ticker", "asset_type", "source", "date"]

# --- stg_daily_nav (db_connector.py:126-147) ------------------------------
# deliberate divergence: the reference's nav DDL carries no row_hash (its
# nav loader upserts unconditionally); the engine keeps the uniform audit
# pair so the SAME hash-guarded merge kernel serves every table — an
# additive column, ignored by the unconditional-merge path
DAILY_NAV = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("nav_price", dec(18, 4)),
        _f("currency", S),
        _f("as_of_date", D, False),
        _f("scrape_date", D),
        *_AUDIT,
    ]
)
DAILY_NAV_KEY = ["ticker", "asset_type", "source", "as_of_date"]

# --- stg_dividend_history (db_connector.py:151-174) -----------------------
# "Flexible Mode" in the reference: NO NOT NULL anywhere — even the key
# columns are nullable (the unique constraint still covers them; the merge
# engine's eqNullSafe key join handles NULL key values), so a dividend row
# with an unknown ex_date is accepted, as the reference accepts it.
DIVIDEND_HISTORY = T.StructType(
    [
        _f("ticker", S),
        _f("asset_type", S),
        _f("source", S),
        _f("ex_date", D),
        _f("payment_date", D),
        _f("amount", dec(18, 6)),
        _f("currency", S),
        _f("type", S),
        *_AUDIT,
    ]
)
DIVIDEND_HISTORY_KEY = ["ticker", "asset_type", "source", "ex_date", "payment_date", "amount", "type"]

# --- stg_allocations (db_connector.py:175-200) -----------------------------
ALLOCATIONS = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("allocation_type", S, False),
        _f("item_name", S, False),
        _f("value_net", dec(10, 4)),
        _f("value_category_avg", dec(10, 4)),
        _f("value_long", dec(10, 4)),
        _f("value_short", dec(10, 4)),
        # nullable per the DDL (db_connector.py:196): the unique constraint
        # includes as_of_date but the column itself carries no NOT NULL
        _f("as_of_date", D),
        *_AUDIT,
    ]
)
ALLOCATIONS_KEY = ["ticker", "asset_type", "source", "allocation_type", "item_name", "as_of_date"]

# --- stg_fund_info (db_connector.py:205-237) --------------------------------
FUND_INFO = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("name", S),
        _f("isin_number", S),
        _f("cusip_number", S),
        _f("issuer", S),
        _f("category", S),
        _f("index_benchmark", S),
        _f("inception_date", D),
        _f("exchange", S),
        _f("region", S),
        _f("country", S),
        _f("leverage", S),
        _f("options", S),
        _f("shares_out", dec(20, 2)),
        _f("market_cap_size", S),
        _f("investment_style", S),
        *_AUDIT,
    ]
)
FUND_INFO_KEY = ["ticker", "asset_type", "source"]

# --- stg_fund_fees (db_connector.py:241-266) --------------------------------
FUND_FEES = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("expense_ratio", dec(5, 4)),
        _f("initial_charge", dec(5, 4)),
        _f("exit_charge", dec(5, 4)),
        _f("assets_aum", dec(20, 2)),
        _f("top_10_hold_pct", dec(5, 2)),
        _f("holdings_count", T.IntegerType()),
        _f("holdings_turnover", dec(5, 2)),
        *_AUDIT,
    ]
)
FUND_FEES_KEY = ["ticker", "asset_type", "source"]

# --- stg_fund_risk (db_connector.py:270-295) --------------------------------
_RISK_TIERS = ("1y", "3y", "5y", "10y")
_LIPPER_TIERS = ("3y", "5y", "10y", "overall")
FUND_RISK = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        *[_f(f"sharpe_ratio_{t}", dec(5, 2)) for t in _RISK_TIERS],
        *[_f(f"beta_{t}", dec(5, 2)) for t in _RISK_TIERS],
        *[_f(f"alpha_{t}", dec(5, 2)) for t in _RISK_TIERS],
        *[_f(f"standard_dev_{t}", dec(5, 2)) for t in _RISK_TIERS],
        *[_f(f"r_squared_{t}", dec(5, 2)) for t in _RISK_TIERS],
        _f("rsi_daily", dec(5, 2)),
        _f("moving_avg_200", dec(10, 2)),
        _f("morningstar_rating", T.IntegerType()),
        *[_f(f"lipper_total_return_{t}", T.IntegerType()) for t in _LIPPER_TIERS],
        *[_f(f"lipper_consistent_return_{t}", T.IntegerType()) for t in _LIPPER_TIERS],
        *[_f(f"lipper_preservation_{t}", T.IntegerType()) for t in _LIPPER_TIERS],
        *[_f(f"lipper_expense_{t}", T.IntegerType()) for t in _LIPPER_TIERS],
        *_AUDIT,
    ]
)
FUND_RISK_KEY = ["ticker", "asset_type", "source"]

# --- stg_fund_policy (db_connector.py:299-324) -------------------------------
FUND_POLICY = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("dividend_yield", dec(5, 2)),
        *[_f(f"dividend_growth_{t}", dec(5, 2)) for t in _RISK_TIERS],
        _f("dividend_consecutive_years", T.IntegerType()),
        _f("payout_ratio", dec(5, 2)),
        _f("total_return_ytd", dec(5, 2)),
        _f("total_return_1y", dec(5, 2)),
        _f("pe_ratio", dec(5, 2)),
        *_AUDIT,
    ]
)
FUND_POLICY_KEY = ["ticker", "asset_type", "source"]

# --- stg_fund_holdings (db_connector.py:320-347) ------------------------------
FUND_HOLDINGS = T.StructType(
    [
        _f("ticker", S, False),
        _f("asset_type", S, False),
        _f("source", S, False),
        _f("holding_ticker", S),
        _f("holding_name", S, False),
        _f("holding_percentage", dec(10, 4)),
        _f("shares_held", dec(20, 2)),
        _f("market_value", dec(20, 2)),
        _f("sector", S),
        _f("country", S),
        # nullable per the DDL (db_connector.py:339) despite being in the key
        _f("as_of_date", D),
        *_AUDIT,
    ]
)
FUND_HOLDINGS_KEY = ["ticker", "asset_type", "source", "holding_name", "as_of_date"]


TABLES: dict[str, tuple[T.StructType, list[str]]] = {
    "stg_security_master": (SECURITY_MASTER, SECURITY_MASTER_KEY),
    "stg_price_history": (PRICE_HISTORY, PRICE_HISTORY_KEY),
    "stg_daily_nav": (DAILY_NAV, DAILY_NAV_KEY),
    "stg_dividend_history": (DIVIDEND_HISTORY, DIVIDEND_HISTORY_KEY),
    "stg_allocations": (ALLOCATIONS, ALLOCATIONS_KEY),
    "stg_fund_info": (FUND_INFO, FUND_INFO_KEY),
    "stg_fund_fees": (FUND_FEES, FUND_FEES_KEY),
    "stg_fund_risk": (FUND_RISK, FUND_RISK_KEY),
    "stg_fund_policy": (FUND_POLICY, FUND_POLICY_KEY),
    "stg_fund_holdings": (FUND_HOLDINGS, FUND_HOLDINGS_KEY),
}
