"""Stream-stream trades×quotes join: watermarked interval join in flight,
nearest-quote collapse at rest (streaming/joins.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from stock_ops_spark.schemas import STREAMING
from stock_ops_spark.streaming.joins import nearest_quote_per_trade, quotes_for_trades

BASE = 1755526500000  # ms


def _write(dirpath, name, records):
    with open(dirpath / name, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _stream(spark, path):
    return spark.readStream.schema(STREAMING).json(str(path))


def test_stream_stream_interval_join_and_nearest(spark, tmp_path):
    tdir, qdir = tmp_path / "trades", tmp_path / "quotes"
    tdir.mkdir(), qdir.mkdir()
    _write(
        tdir,
        "t.json",
        [
            {"ticker": "SPY", "timestamp_UTC_ms": BASE + 30_000, "price": 643.1, "volume": 10},
            {"ticker": "SPY", "timestamp_UTC_ms": BASE + 90_000, "price": 643.3, "volume": 5},
            {"ticker": "VOO", "timestamp_UTC_ms": BASE + 30_000, "price": 590.0, "volume": 2},
        ],
    )
    _write(
        qdir,
        "q.json",
        [
            # within 60s before SPY trade 1 (and >60s before trade 2)
            {"ticker": "SPY", "timestamp_UTC_ms": BASE + 10_000, "ask_price": 643.2, "bid_price": 643.0},
            # fresher quote, still before trade 1; within 60s of trade 2 too
            {"ticker": "SPY", "timestamp_UTC_ms": BASE + 25_000, "ask_price": 643.25, "bid_price": 643.05},
            # after trade 1, within window of trade 2 only
            {"ticker": "SPY", "timestamp_UTC_ms": BASE + 80_000, "ask_price": 643.4, "bid_price": 643.2},
            # wrong ticker for SPY trades
            {"ticker": "VOO", "timestamp_UTC_ms": BASE + 20_000, "ask_price": 590.1, "bid_price": 589.9},
        ],
    )

    joined = quotes_for_trades(
        _stream(spark, tdir), _stream(spark, qdir), tolerance_seconds=60
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ss_join").collect()

    # trade1(SPY,+30s): quotes at +10s, +25s. trade2(SPY,+90s): quotes at
    # +80s (and NOT +25s: 65s old > 60s tolerance). VOO trade: quote +20s.
    by_trade = {}
    for r in rows:
        by_trade.setdefault((r.ticker, r.trade_ts), []).append(r)
    key1 = [k for k in by_trade if k[0] == "SPY" and k[1].second == 30][0]
    assert len(by_trade[key1]) == 2
    key2 = [k for k in by_trade if k[0] == "SPY" and k[1] != key1[1]][0]
    assert [r.quote_age_ms for r in by_trade[key2]] == [10_000]
    assert len(by_trade[[k for k in by_trade if k[0] == "VOO"][0]]) == 1
    assert all(abs(r.spread - 0.2) < 1e-9 for r in rows)

    # at-rest collapse: one freshest quote per trade
    nearest = nearest_quote_per_trade(spark.sql("select * from ss_join"))
    got = {
        (r.ticker, r.trade_ts): (r.quote_age_ms, r.ask_price)
        for r in nearest.collect()
    }
    assert len(got) == 3
    assert got[key1] == (5_000, 643.25)  # +25s quote beats +10s
    assert got[key2] == (10_000, 643.4)


def test_stream_join_state_is_watermark_bounded(spark, tmp_path):
    """The physical plan must carry event-time range bounds on both sides
    (state expiry) — assert watermarks + join condition survive analysis
    as a stream-stream join, not fall back to a batch plan."""
    tdir, qdir = tmp_path / "t2", tmp_path / "q2"
    tdir.mkdir(), qdir.mkdir()
    _write(tdir, "t.json", [{"ticker": "SPY", "timestamp_UTC_ms": BASE, "price": 1.0, "volume": 1}])
    _write(qdir, "q.json", [{"ticker": "SPY", "timestamp_UTC_ms": BASE, "ask_price": 1.0, "bid_price": 0.9}])
    joined = quotes_for_trades(_stream(spark, tdir), _stream(spark, qdir))
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan  # both sides carry watermarks
    assert plan.count("EventTimeWatermark") == 2


def test_left_outer_emits_unquoted_trades_below_watermark(spark, tmp_path):
    """how='left_outer': a trade with no quote in its window is emitted
    with NULL quote columns — but only once the global watermark passes
    its timestamp.  A late trade (inside the final watermark window)
    stays buffered and must NOT appear unmatched."""
    tdir, qdir = tmp_path / "t3", tmp_path / "q3"
    tdir.mkdir(), qdir.mkdir()
    HOUR = 3_600_000
    _write(
        tdir,
        "t.json",
        [
            # old, quoted
            {"ticker": "SPY", "timestamp_UTC_ms": BASE, "price": 1.0, "volume": 1},
            # old, UNQUOTED (no quote within 60s) -> must emit with nulls
            {"ticker": "VOO", "timestamp_UTC_ms": BASE, "price": 2.0, "volume": 1},
            # recent, unquoted, ABOVE final watermark -> must stay buffered
            {"ticker": "IWM", "timestamp_UTC_ms": BASE + 3 * HOUR, "price": 3.0, "volume": 1},
        ],
    )
    _write(
        qdir,
        "q.json",
        [
            {"ticker": "SPY", "timestamp_UTC_ms": BASE - 10_000, "ask_price": 1.1, "bid_price": 0.9},
            # advances the quote-side max event time past the old trades
            {"ticker": "QQQ", "timestamp_UTC_ms": BASE + 3 * HOUR, "ask_price": 9.9, "bid_price": 9.7},
        ],
    )
    joined = quotes_for_trades(
        _stream(spark, tdir),
        _stream(spark, qdir),
        tolerance_seconds=60,
        trade_watermark="10 minutes",
        quote_watermark="10 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_loj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ss_loj").collect()
    by_ticker = {r.ticker: r for r in rows}
    assert by_ticker["SPY"].ask_price == 1.1          # matched normally
    assert by_ticker["VOO"].quote_ts is None          # flushed unmatched
    assert by_ticker["VOO"].spread is None
    assert "IWM" not in by_ticker                     # still undecidable
