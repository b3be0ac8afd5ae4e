"""Provider-payload normalization (reference P1/P2/P3, transform.py:29-97).

Four record shapes, each a pure select/alias/cast projection over the raw
provider DataFrame — the declarative twin of the reference's per-row dict
rewrites.  Malformed rows (missing required keys) are split out, not
raised, so one bad frame can't kill a 100 TB ingest (P2 as a filter, with
the rejects available for a dead-letter sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_ops_spark.schemas import INTERDAY_INTERVALS, INTRADAY_INTERVALS

# raw field → engine field per record kind (reference transform.py:29-97)
# interday raw:  {date, open, high, low, close, adjusted_close, volume}
# intraday raw:  {timestamp, open, high, low, close, volume}
# trade raw:     {s, t, p, v}
# quote raw:     {s, t, ap, bp, as, bs}


def _split_valid(df: DataFrame, required: list[str]):
    cond = None
    for c in required:
        term = F.col(c).isNotNull()
        cond = term if cond is None else (cond & term)
    return df.where(cond), df.where(~cond)


def interday(
    raw: DataFrame, ticker: str | None, interval: str
) -> tuple[DataFrame, DataFrame]:
    """EODHD interday bars → HISTORICAL_INTERDAY rows (+ rejects).
    ``ticker=None`` takes the ticker from a raw column instead of a
    literal — the multi-ticker path used by the ``stockops_rest``
    Python DataSource (sources/pyds.py)."""
    if interval not in INTERDAY_INTERVALS:  # P3 domain predicate
        raise ValueError(f"interval {interval!r} not in {INTERDAY_INTERVALS}")
    ok, bad = _split_valid(raw, ["date"])
    out = ok.select(
        (F.col("ticker") if ticker is None else F.lit(ticker)).alias("ticker"),
        F.to_date("date").alias("date"),
        F.col("open").cast("double").alias("open"),
        F.col("high").cast("double").alias("high"),
        F.col("low").cast("double").alias("low"),
        F.col("close").cast("double").alias("close"),
        F.col("adjusted_close").cast("double").alias("adjusted_close"),
        F.col("volume").cast("long").alias("volume"),
        F.lit(interval).alias("interval"),
    )
    return out, bad


def intraday(
    raw: DataFrame, ticker: str | None, interval: str
) -> tuple[DataFrame, DataFrame]:
    """EODHD intraday bars → HISTORICAL_INTRADAY rows (+ rejects).
    Raw 'timestamp' is epoch seconds (reference transform.py:47-61).
    ``ticker=None``: see interday."""
    if interval not in INTRADAY_INTERVALS:
        raise ValueError(f"interval {interval!r} not in {INTRADAY_INTERVALS}")
    ok, bad = _split_valid(raw, ["timestamp"])
    out = ok.select(
        (F.col("ticker") if ticker is None else F.lit(ticker)).alias("ticker"),
        F.col("timestamp").cast("long").alias("timestamp_UTC_s"),
        F.col("open").cast("double").alias("open"),
        F.col("high").cast("double").alias("high"),
        F.col("low").cast("double").alias("low"),
        F.col("close").cast("double").alias("close"),
        F.col("volume").cast("long").alias("volume"),
        F.lit(interval).alias("interval"),
    )
    return out, bad


def trades(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """WebSocket trade frames {s,t,p,v} → STREAMING rows (NULL-padded quote
    columns), ticker from the payload's 's' field (reference
    eodhd_streaming_service.py:186-188)."""
    ok, bad = _split_valid(raw, ["s", "t"])
    out = ok.select(
        F.col("s").cast("string").alias("ticker"),
        F.col("t").cast("long").alias("timestamp_UTC_ms"),
        F.col("p").cast("double").alias("price"),
        F.col("v").cast("long").alias("volume"),
        F.lit(None).cast("double").alias("ask_price"),
        F.lit(None).cast("double").alias("bid_price"),
        F.lit(None).cast("long").alias("ask_size"),
        F.lit(None).cast("long").alias("bid_size"),
    )
    return out, bad


def quotes(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """WebSocket quote frames {s,t,ap,bp,as,bs} → STREAMING rows."""
    ok, bad = _split_valid(raw, ["s", "t"])
    out = ok.select(
        F.col("s").cast("string").alias("ticker"),
        F.col("t").cast("long").alias("timestamp_UTC_ms"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("long").alias("volume"),
        F.col("ap").cast("double").alias("ask_price"),
        F.col("bp").cast("double").alias("bid_price"),
        F.col("as").cast("long").alias("ask_size"),
        F.col("bs").cast("long").alias("bid_size"),
    )
    return out, bad
