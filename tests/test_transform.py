"""P1-P3 normalization: the four record-shape projections + reject split."""

from __future__ import annotations

import pytest

from stock_ops_spark.sources import transform as X


def test_interday_projection(spark):
    raw = spark.createDataFrame(
        [
            ("2024-10-25", 534.65, 537.2601, 531.414, 532.26, 527.1013, 4327190),
            (None, 1.0, 1.0, 1.0, 1.0, 1.0, 1),  # missing date → reject
        ],
        "date string, open double, high double, low double, close double, adjusted_close double, volume long",
    )
    ok, bad = X.interday(raw, "VOO", "d")
    rows = ok.collect()
    assert len(rows) == 1 and bad.count() == 1
    r = rows[0]
    assert r.ticker == "VOO" and str(r.date) == "2024-10-25"
    assert r.interval == "d" and r.adjusted_close == 527.1013

    with pytest.raises(ValueError):
        X.interday(raw, "VOO", "1h")  # P3 interval domain


def test_trade_quote_union_schema(spark):
    t_raw = spark.createDataFrame(
        [("SPY", 1755526571834, 643.155, 10)], "s string, t long, p double, v long"
    )
    q_raw = spark.createDataFrame(
        [("SPY", 1755526651074, 643.205, 643.1985, 1, 1)],
        "s string, t long, ap double, bp double, `as` long, bs long",
    )
    t_ok, _ = X.trades(t_raw)
    q_ok, _ = X.quotes(q_raw)
    assert t_ok.columns == q_ok.columns  # one union schema (J3 coexistence)
    both = t_ok.unionByName(q_ok)
    rows = {r.timestamp_UTC_ms: r for r in both.collect()}
    assert rows[1755526571834].price == 643.155
    assert rows[1755526571834].ask_price is None
    assert rows[1755526651074].ask_price == 643.205
    assert rows[1755526651074].price is None


def test_intraday_null_volume_preserved(spark):
    raw = spark.createDataFrame(
        [(1751486400, 617.0, 618.0, 616.0, 617.5, None)],
        "timestamp long, open double, high double, low double, close double, volume long",
    )
    ok, bad = X.intraday(raw, "SPY", "1h")
    r = ok.collect()[0]
    assert r.volume is None and r.timestamp_UTC_s == 1751486400
    assert bad.count() == 0
