"""Custom stateful streaming operators (ST4 upgrade).

The reference keeps no in-stream state (stats are per-batch table
increments); Spark's ``applyInPandasWithState`` unlocks true running state
per key.  ``running_vwap`` maintains cumulative volume-weighted average
price per ticker across micro-batches — the canonical custom stateful
operator a trading pipeline wants and SQL can't express incrementally.

State layout: (sum_pv: double, sum_v: long, n_trades: long) per ticker.
Works identically under ``update`` output mode with checkpointed state;
the batch twin (for tests/oracles) is a plain groupBy aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

VWAP_OUTPUT = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("vwap", DoubleType(), True),
        StructField("total_volume", LongType(), True),
        StructField("n_trades", LongType(), True),
    ]
)

VWAP_STATE = StructType(
    [
        StructField("sum_pv", DoubleType(), True),
        StructField("sum_v", LongType(), True),
        StructField("n", LongType(), True),
    ]
)


def _vwap_fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    sum_pv, sum_v, n = state.get if state.exists else (0.0, 0, 0)
    for pdf in pdfs:
        valid = pdf.dropna(subset=["price", "volume"])
        sum_pv += float((valid["price"] * valid["volume"]).sum())
        sum_v += int(valid["volume"].sum())
        n += len(valid)
    state.update((sum_pv, sum_v, n))
    vwap = (sum_pv / sum_v) if sum_v else None
    yield pd.DataFrame(
        {
            "ticker": [key[0]],
            "vwap": [vwap],
            "total_volume": [sum_v],
            "n_trades": [n],
        }
    )


def running_vwap(trades: DataFrame) -> DataFrame:
    """Per-ticker running VWAP over a streaming (or batch) trades frame.

    On a stream: emits the updated running value every micro-batch
    (outputMode 'update'); state survives restarts via the checkpoint.
    """
    return (
        trades.select("ticker", "price", "volume")
        .groupBy("ticker")
        .applyInPandasWithState(
            _vwap_fn,
            outputStructType=VWAP_OUTPUT,
            stateStructType=VWAP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_vwap(trades: DataFrame) -> DataFrame:
    """Batch twin of running_vwap (same formula, plain aggregate) — the
    ground truth the stateful operator must converge to after draining."""
    valid = trades.where(F.col("price").isNotNull() & F.col("volume").isNotNull())
    return valid.groupBy("ticker").agg(
        (F.sum(F.col("price") * F.col("volume")) / F.sum("volume")).alias("vwap"),
        F.sum("volume").cast("long").alias("total_volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )


# ---------------------------------------------------------------------------
# Streaming sessionization with event-time state timeout
# ---------------------------------------------------------------------------

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_ms", LongType(), True),
        StructField("session_end_ms", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("sum_value", DoubleType(), True),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType(), True),
        StructField("end_ms", LongType(), True),
        StructField("n", LongType(), True),
        StructField("sv", DoubleType(), True),
    ]
)

_SESSION_GAP_MS = 30 * 60 * 1000


def _session_fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
    """Arbitrary-stateful sessionization: extend the open session with
    every event within the gap; close-and-emit on a gap jump or on
    event-time timeout (the watermark passed start+gap: no in-gap event
    can arrive any more).  Closed sessions are emitted exactly once —
    the operator's output is append-shaped."""
    import pandas as pd

    closed = []
    if state.hasTimedOut:
        start, end, n, sv = state.get
        closed.append((key[0], start, end, n, sv))
        state.remove()
    else:
        ts = []
        vals = []
        for pdf in pdfs:
            ts.extend(int(t.value // 1_000_000) for t in pdf["ts"])
            vals.extend(float(v) for v in pdf["value"])
        order = sorted(range(len(ts)), key=ts.__getitem__)
        cur = state.get if state.exists else None
        for i in order:
            t, v = ts[i], vals[i]
            if cur is None:
                cur = (t, t, 1, v)
            elif t - cur[1] <= _SESSION_GAP_MS:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
            else:
                closed.append((key[0], *cur))
                cur = (t, t, 1, v)
        if cur is not None:
            state.update(cur)
            # timeout once the watermark clears the last event + gap
            state.setTimeoutTimestamp(cur[1] + _SESSION_GAP_MS)
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_ms", "session_end_ms", "n_events", "sum_value"],
        )


def streaming_sessions(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user —
    ``applyInPandasWithState`` + EventTimeTimeout: state is closed by the
    WATERMARK, not by wall-clock, so replays are deterministic.  Expects
    columns (user_id, ts: timestamp, value)."""
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
