"""Unit tests for technical-indicator operators (operators/timeseries.py)
on hand-computed fixtures, plus plan pins: every indicator is a single
exchange on the instrument key."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stock_ops_spark.operators.timeseries import (
    bollinger,
    ewma_bounded,
    max_drawdown,
    rsi,
    vwap,
)
from stock_ops_spark.plans import audit as A


def _ticks(spark, prices, key="A"):
    rows = [(key, i, i, float(p)) for i, p in enumerate(prices)]
    return spark.createDataFrame(rows, "k string, ts long, eid long, v double")


def test_max_drawdown_hand_computed(spark):
    df = _ticks(spark, [10, 8, 12, 6, 9])
    out = max_drawdown(df, "k", "ts", "v", "eid").collect()[0]
    assert out["max_drawdown"] == 0.5  # peak 12 -> trough 6
    assert out["peak_value"] == 12.0
    assert out["n_ticks"] == 5


def test_max_drawdown_monotonic_rise_is_zero(spark):
    df = _ticks(spark, [1, 2, 3])
    assert max_drawdown(df, "k", "ts", "v", "eid").collect()[0]["max_drawdown"] == 0.0


def test_ewma_bounded_alpha_half(spark):
    df = _ticks(spark, [1, 2, 3])
    out = ewma_bounded(df, "k", "ts", "v", "eid", alpha=0.5, n_lags=2)
    vals = [r["ewma"] for r in out.orderBy("ts").collect()]
    assert vals[0] == 1.0
    assert abs(vals[1] - (2 + 0.5) / 1.5) < 1e-12
    assert abs(vals[2] - (3 + 1.0 + 0.25) / 1.75) < 1e-12


def test_ewma_partition_heads_normalize_per_key(spark):
    df = _ticks(spark, [5, 5], key="A").union(_ticks(spark, [7], key="B"))
    out = {r["k"]: r["ewma"] for r in ewma_bounded(df, "k", "ts", "v", "eid", 0.5, 4).collect()}
    assert out["B"] == 7.0  # B's head sees no A history


def test_rsi_hand_computed(spark):
    df = _ticks(spark, [1, 2, 1, 3])
    rows = rsi(df, "k", "ts", "v", "eid", n=2).orderBy("ts").collect()
    assert rows[0]["rsi"] is None  # no change yet
    # frame at row 4: changes (-1, +2) -> gain 1, loss 0.5 -> 100-100/3
    assert abs(rows[3]["rsi"] - (100 - 100 / 3)) < 1e-9
    assert rows[3]["n_changes"] == 2


def test_rsi_all_gain_pins_100(spark):
    df = _ticks(spark, [1, 2, 3, 4])
    rows = rsi(df, "k", "ts", "v", "eid", n=2).orderBy("ts").collect()
    assert rows[3]["rsi"] == 100.0


def test_bollinger_bands_hand_computed(spark):
    df = _ticks(spark, [1, 3])
    rows = bollinger(df, "k", "ts", "v", "eid", n=2, width=2.0).orderBy("ts").collect()
    assert rows[0]["bb_upper"] is None  # 1-row frame: stddev NULL
    assert rows[1]["bb_mid"] == 2.0
    assert abs(rows[1]["bb_upper"] - (2 + 2 * math.sqrt(2))) < 1e-12
    assert abs(rows[1]["bb_lower"] - (2 - 2 * math.sqrt(2))) < 1e-12
    assert rows[1]["bb_breach"] == 0


def test_vwap_weights_by_quantity(spark):
    df = spark.createDataFrame(
        [("p", 10.0, 1.0), ("p", 20.0, 3.0)], "g string, price double, qty double"
    )
    out = vwap(df, ["g"], "price", "qty").collect()[0]
    assert out["vwap"] == (10 + 60) / 4.0
    assert out["total_qty"] == 4.0
    assert out["n_trades"] == 2


def test_indicator_stack_single_exchange(spark):
    """All per-key indicators over one key column share ONE shuffle: the
    whole indicator pass is exchange(key) + in-partition sort."""
    df = _ticks(spark, range(50))
    stacked = ewma_bounded(
        rsi(
            bollinger(df, "k", "ts", "v", "eid", n=8),
            "k",
            "ts",
            "v",
            "eid",
            n=7,
        ),
        "k",
        "ts",
        "v",
        "eid",
        alpha=0.5,
        n_lags=8,
    )
    assert A.count_shuffles(stacked) == 1
    assert not A.has_cartesian(stacked)


def test_drawdown_single_exchange(spark):
    df = _ticks(spark, [3, 1, 4, 1, 5])
    out = max_drawdown(df, "k", "ts", "v", "eid")
    # window partition and groupBy share the same key -> one exchange
    assert A.count_shuffles(out) == 1


def test_bollinger_chunked_matches_plain(spark):
    """The skew-hardened chunked form is numerically identical to the
    per-key window when the bucket precondition holds."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stock_ops_spark.operators.timeseries import bollinger, bollinger_chunked

    base = dt.datetime(2024, 1, 1)
    rows = []
    for k in ("A", "B"):
        for day in range(4):
            for i in range(12):  # 12 ticks/day >= n-1 = 7
                ts = base + dt.timedelta(days=day, minutes=i)
                rows.append((k, ts, day * 100 + i, float((day * 31 + i * 7) % 50)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, v double")

    plain = bollinger(df, "k", "ts", "v", "eid", n=8, width=2.0)
    chunk = bollinger_chunked(
        df, "k", "ts", "v", "eid", bucket=F.to_date("ts"), n=8, width=2.0
    )

    def canon(out):
        return sorted(
            (
                r["k"], r["eid"], r["n_in_frame"],
                None if r["bb_mid"] is None else round(r["bb_mid"], 9),
                None if r["bb_upper"] is None else round(r["bb_upper"], 9),
                r["bb_breach"],
            )
            for r in out.collect()
        )

    assert canon(plain) == canon(chunk)


def test_bollinger_chunked_no_key_wide_partition(spark):
    """Plan shape: no window partitions on the bare key — every window
    (bucket sequencing included) carries a second partition column, so a
    hot key cannot serialize into one task."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stock_ops_spark.operators.timeseries import bollinger_chunked

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("A", base + dt.timedelta(days=d, minutes=i), d * 100 + i, 1.0 * i)
        for d in range(3)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, v double")
    out = bollinger_chunked(df, "k", "ts", "v", "eid", bucket=F.to_date("ts"), n=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    # every window over TICK data must partition on (key, bucket-seq);
    # bare-key partitioning is allowed only for the dense_rank bucket
    # sequencer, which windows over the tiny distinct-bucket set
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    tick_lines = [l for l in win_lines if "dense_rank" not in l]
    assert tick_lines, "expected tick window operators in plan"
    for line in tick_lines:
        m = re.search(r"\], \[([^\]]+)\], \[", line)
        assert m, line
        assert "__bseq" in m.group(1), line


def test_max_drawdown_chunked_matches_plain(spark):
    """The two-level prefix-max decomposition is exact — no density
    precondition — so results equal the per-key form on any fixture,
    including buckets with a single row and empty gap days."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stock_ops_spark.operators.timeseries import max_drawdown, max_drawdown_chunked

    base = dt.datetime(2024, 1, 1)
    rows = []
    prices = [10, 8, 12, 6, 9, 15, 3, 3, 20, 1]
    for k in ("A", "B"):
        for i, p in enumerate(prices):
            # sparse, irregular buckets: day jumps of 0-3
            day = (i * 7) % 11
            rows.append((k, base + dt.timedelta(days=day, minutes=i), i, float(p)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, v double")

    plain = {
        r["k"]: (r["max_drawdown"], r["peak_value"], r["n_ticks"])
        for r in max_drawdown(df, "k", "ts", "v", "eid").collect()
    }
    chunk = {
        r["k"]: (r["max_drawdown"], r["peak_value"], r["n_ticks"])
        for r in max_drawdown_chunked(
            df, "k", "ts", "v", "eid", bucket=F.to_date("ts")
        ).collect()
    }
    assert plain == chunk


def test_max_drawdown_chunked_no_bare_key_tick_window(spark):
    import datetime as dt
    import re

    from pyspark.sql import functions as F

    from stock_ops_spark.operators.timeseries import max_drawdown_chunked

    base = dt.datetime(2024, 1, 1)
    rows = [("A", base + dt.timedelta(days=d, minutes=i), d * 10 + i, 1.0 * i)
            for d in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, v double")
    out = max_drawdown_chunked(df, "k", "ts", "v", "eid", bucket=F.to_date("ts"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the only bare-key window is the per-bucket-summary prefix pass
    # (ordered by __b); tick windows all carry __b in the partition spec
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        m = re.search(r"\], \[([^\]]+)\], \[([^\]]+)\]", line)
        assert m, line
        part, order = m.group(1), m.group(2)
        if "__b" not in part:
            assert "__b" in order, line  # summary-frame pass, not ticks


def test_prefix_sum_chunked_matches_global_window(spark):
    """The two-pass decomposition must equal the single-window global
    cumulative sum exactly, including bucket boundaries and negative
    deltas (the q146 sweep-line shape)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stock_ops_spark.operators.timeseries import prefix_sum_chunked

    rng = random.Random(7)
    rows = [
        (
            f"2024-01-{1 + rng.randrange(5):02d} {rng.randrange(24):02d}:{rng.randrange(60):02d}:{i % 60:02d}",
            rng.choice([-3, -1, 1, 2, 5]),
        )
        for i in range(400)
    ]
    df = (
        spark.createDataFrame(rows, "ts string, d long")
        .select(F.col("ts").cast("timestamp").alias("ts"), "d")
        .groupBy("ts")
        .agg(F.sum("d").alias("d"))
    )
    got = {
        r["ts"]: r["__cum"]
        for r in prefix_sum_chunked(df, "ts", "d", F.to_date("ts")).collect()
    }
    w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["ts"]: r["cum"]
        for r in df.withColumn("cum", F.sum("d").over(w)).collect()
    }
    assert got == want


def test_prefix_sum_chunked_null_bucket_raises(spark):
    """ADVICE r5: a NULL bucket used to be silently dropped by the
    offset equi-join, returning partial sums.  The operator now
    raises instead — misuse fails loudly."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from stock_ops_spark.operators.timeseries import prefix_sum_chunked

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1), (None, 2)], "ts string, d long"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "d")
    out = prefix_sum_chunked(df, "ts", "d", F.to_date("ts"))
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "prefix_sum_chunked" in str(ei.value)
