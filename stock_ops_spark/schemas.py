"""Fixed StructTypes for the four record kinds the reference ingests.

The reference infers SQLite column affinities from the first non-null value
(reference ``src/stockops/data/database/sql_db.py:43-56``); here the four
post-transform record shapes (reference ``src/stockops/data/transform.py:29-97``,
FIXTURES.md) are static, so the engine declares them as explicit StructTypes
— schema-on-write, with ``mergeSchema`` covering evolution.

All value columns are nullable (the fixture contains a None-volume intraday
row that must round-trip as NULL).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Interval domains (reference src/stockops/data/transform.py:18-21)
INTERDAY_INTERVALS = ("d", "w", "m")
INTRADAY_INTERVALS = ("1m", "5m", "1h")

# historical_interday: key (date, interval); one row per (ticker, date, interval, version)
HISTORICAL_INTERDAY = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("adjusted_close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("interval", T.StringType(), False),
    ]
)

# historical_intraday: key (timestamp_UTC_s, interval)
HISTORICAL_INTRADAY = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("timestamp_UTC_s", T.LongType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("interval", T.StringType(), False),
    ]
)

# streaming: trades and quotes share one union schema with NULL-padded
# columns (reference stores both shapes in one ticker table; FIXTURES.md §4)
STREAMING = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("timestamp_UTC_ms", T.LongType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("ask_price", T.DoubleType(), True),
        T.StructField("bid_price", T.DoubleType(), True),
        T.StructField("ask_size", T.LongType(), True),
        T.StructField("bid_size", T.LongType(), True),
    ]
)

# Index (logical-key) columns per mode (reference sql_db.py:59-67)
INDEX_COLS = {
    "historical_interday": ["ticker", "date", "interval"],
    "historical_intraday": ["ticker", "timestamp_UTC_s", "interval"],
    "streaming": ["ticker", "timestamp_UTC_ms"],
}

# Timestamp column per mode (reference database/utils.py:12-23)
TS_COL = {
    "historical_interday": "date",
    "historical_intraday": "timestamp_UTC_s",
    "streaming": "timestamp_UTC_ms",
}

SCHEMAS = {
    "historical_interday": HISTORICAL_INTERDAY,
    "historical_intraday": HISTORICAL_INTRADAY,
    "streaming": STREAMING,
}


def payload_cols(mode: str) -> list[str]:
    """Non-key columns for a mode — the columns the reference's exact-dup
    check compares (sql_db.py:476-497)."""
    schema = SCHEMAS[mode]
    keys = set(INDEX_COLS[mode])
    return [f.name for f in schema.fields if f.name not in keys]
