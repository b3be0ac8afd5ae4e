"""Stream-stream joins (ST3/J3 streaming twin).

The reference co-timestamps trades and quotes only at rest (batch J3,
``transform.py`` trade/quote shapes landed in one store).  Spark's
stream-stream join does it in flight: both sides are watermarked, the
join condition carries an event-time range, and Spark buffers exactly
the window of each side the condition makes reachable — state is bounded
by (watermark + tolerance), not by stream length, so the operator runs
indefinitely at any scale.

``quotes_for_trades`` implements the canonical enrichment: each trade
picks up the quotes observed in the ``tolerance`` window just before it
(same ticker).  A strict streaming as-of (exactly one latest quote per
trade) needs arbitrary per-key state; the interval form is the
Spark-native expressible contract and the batch as-of operator
(operators/asof.py) is its at-rest twin — a downstream
``min_by(quote_age)`` per trade collapses the interval to nearest-quote
when one row per trade is wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quotes_for_trades(
    trades: DataFrame,
    quotes: DataFrame,
    tolerance_seconds: int = 60,
    trade_watermark: str = "2 minutes",
    quote_watermark: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: trade × quotes with
    ``quote.ts ∈ (trade.ts - tolerance, trade.ts]`` on the same ticker.

    Both inputs are STREAMING-schema frames (ticker, timestamp_UTC_ms,
    …).  The range condition + watermarks are what let Spark expire join
    state: a quote older than (trade watermark + tolerance) can never
    match a future trade and is dropped from the buffer.

    ``how="left_outer"`` additionally emits trades that saw NO quote in
    their window (null quote columns) — but only once the watermark
    passes the trade's timestamp, because until then a matching quote
    may still arrive; trades younger than the final watermark stay
    buffered.  This is the in-flight "unquotable trade" monitor; its
    at-rest twin is a plain left join.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    t = trades.select(
        F.col("ticker"),
        F.timestamp_millis(F.col("timestamp_UTC_ms")).alias("trade_ts"),
        F.col("price"),
        F.col("volume"),
    ).withWatermark("trade_ts", trade_watermark)
    q = quotes.select(
        F.col("ticker").alias("q_ticker"),
        F.timestamp_millis(F.col("timestamp_UTC_ms")).alias("quote_ts"),
        F.col("ask_price"),
        F.col("bid_price"),
    ).withWatermark("quote_ts", quote_watermark)

    cond = (
        (F.col("ticker") == F.col("q_ticker"))
        & (F.col("quote_ts") <= F.col("trade_ts"))
        & (F.col("quote_ts") > F.col("trade_ts") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS"))
    )
    joined = t.join(q, cond, how)
    return joined.select(
        "ticker",
        "trade_ts",
        "price",
        "volume",
        "quote_ts",
        "ask_price",
        "bid_price",
        (F.col("ask_price") - F.col("bid_price")).alias("spread"),
        (
            F.unix_millis(F.col("trade_ts")) - F.unix_millis(F.col("quote_ts"))
        ).alias("quote_age_ms"),
    )


def nearest_quote_per_trade(joined: DataFrame) -> DataFrame:
    """Collapse the interval join to the single freshest quote per trade —
    the batch-side finisher (not a streaming op: a global min over the
    interval needs the interval complete, i.e. the trade past the
    watermark).  Runs on the landed output of ``quotes_for_trades``."""
    return (
        joined.groupBy("ticker", "trade_ts", "price", "volume")
        .agg(
            F.min_by("quote_ts", "quote_age_ms").alias("quote_ts"),
            F.min_by("ask_price", "quote_age_ms").alias("ask_price"),
            F.min_by("bid_price", "quote_age_ms").alias("bid_price"),
            F.min_by("spread", "quote_age_ms").alias("spread"),
            F.min("quote_age_ms").alias("quote_age_ms"),
        )
    )
