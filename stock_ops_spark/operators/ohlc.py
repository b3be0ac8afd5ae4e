"""Session OHLC aggregation — the reference's flagship analytic.

Reference behavior (``local_workflows/reader_local/local_reader_manual.py:248-270``):
slice trades to the exchange session (09:30–16:00 local), then
high = max(price), low = min(price), and open/close = price at the
timestamp *nearest* the session open/close bound (argmin |ts − bound|).

Spark-first shape: a single ``groupBy(day)`` with ``min_by``/``max_by``
ordered aggregates — one shuffle on the grouping key, map-side partial
aggregation, no window pass and no UDF.  The nearest-bound argmin is
expressed as ``min_by(price, abs(ts − bound))``; since trades are sliced to
within the session, nearest-to-open is simply the earliest trade and
nearest-to-close the latest, so ``min_by(price, ts)`` / ``max_by(price, ts)``
are the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def session_ohlc(
    trades: DataFrame,
    ts: Column,
    price: Column,
    group_cols: list[Column] | None = None,
    session_open: str = "09:30",
    session_close: str = "16:00",
    tz: str | None = None,
) -> DataFrame:
    """Per-day session OHLC from a trades-shaped DataFrame.

    ``ts`` must be a TimestampType column in UTC; when ``tz`` is given the
    session predicate and day bucketing are evaluated in that zone
    (exchange-local), mirroring the reference's zoneinfo conversions.
    """
    local_ts = F.from_utc_timestamp(ts, tz) if tz else ts
    hm = F.date_format(local_ts, "HH:mm")
    in_session = (hm >= F.lit(session_open)) & (hm <= F.lit(session_close))

    keys = list(group_cols or [])
    day = F.to_date(local_ts).alias("session_date")

    return (
        trades.where(in_session)
        .select(*keys, day, local_ts.alias("__ts"), price.alias("__price"))
        .groupBy(*[c for c in keys] + [F.col("session_date")])
        .agg(
            F.min_by("__price", "__ts").alias("open"),
            F.max("__price").alias("high"),
            F.min("__price").alias("low"),
            F.max_by("__price", "__ts").alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


def bars_from_trades(
    trades: DataFrame,
    ts: Column,
    price: Column,
    volume: Column,
    bar: str = "5 minutes",
    group_cols: list[Column] | None = None,
) -> DataFrame:
    """Derive OHLCV bars at an arbitrary granularity from raw trades — the
    ST3 capability upgrade (tumbling window aggregation).  Works identically
    in batch and Structured Streaming (with a watermark upstream)."""
    keys = list(group_cols or [])
    w = F.window(ts, bar)
    return (
        trades.select(*keys, w.alias("w"), ts.alias("__ts"), price.alias("__p"), volume.alias("__v"))
        .groupBy(*[c for c in keys] + [F.col("w")])
        .agg(
            F.min_by("__p", "__ts").alias("open"),
            F.max("__p").alias("high"),
            F.min("__p").alias("low"),
            F.max_by("__p", "__ts").alias("close"),
            F.sum("__v").alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .withColumn("bar_start", F.col("w.start"))
        .withColumn("bar_end", F.col("w.end"))
        .drop("w")
    )
