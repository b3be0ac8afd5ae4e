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
    ArrayType,
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
        StructField("starts", ArrayType(LongType()), True),
        StructField("ends", ArrayType(LongType()), True),
        StructField("ns", ArrayType(LongType()), True),
        StructField("svs", ArrayType(DoubleType()), True),
    ]
)

_SESSION_GAP_MS = 30 * 60 * 1000


def _session_fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
    """Arbitrary-stateful sessionization over POSSIBLY OUT-OF-ORDER
    events: state holds every open session for the key (parallel
    arrays), each batch interval-merges its events into that list, and a
    session closes exactly when the WATERMARK passes its end + gap —
    at that point any event that could still join it would be
    late-beyond-watermark and filtered before reaching this function, so
    emission is deterministic and exactly-once.  (A single-open-session
    state would mis-merge a late event that predates the open session —
    events up to the watermark delay late must be able to form or extend
    EARLIER sessions.)"""
    import pandas as pd

    gap = _SESSION_GAP_MS
    sessions: list[list] = []
    if state.exists:
        starts, ends, ns, svs = state.get
        sessions = [list(t) for t in zip(starts, ends, ns, svs)]

    new = []
    for pdf in pdfs:
        for t, v in zip(pdf["ts"], pdf["value"]):
            tms = int(t.value // 1_000_000)
            new.append([tms, tms, 1, float(v)])
    if new:
        sessions.extend(new)
        sessions.sort(key=lambda s: (s[0], s[1]))
        merged = [sessions[0]]
        for s in sessions[1:]:
            cur = merged[-1]
            if s[0] - cur[1] <= gap:
                cur[1] = max(cur[1], s[1])
                cur[2] += s[2]
                cur[3] += s[3]
            else:
                merged.append(s)
        sessions = merged

    wm = state.getCurrentWatermarkMs()
    closed = [s for s in sessions if s[1] + gap <= wm]
    kept = [s for s in sessions if s[1] + gap > wm]
    if kept:
        state.update(
            (
                [s[0] for s in kept],
                [s[1] for s in kept],
                [s[2] for s in kept],
                [s[3] for s in kept],
            )
        )
        # wake when the watermark clears the earliest still-open session
        state.setTimeoutTimestamp(min(s[1] for s in kept) + gap)
    elif state.exists:
        state.remove()
    if closed:
        yield pd.DataFrame(
            [(key[0], s[0], s[1], s[2], s[3]) for s in closed],
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


# ---------------------------------------------------------------------------
# Streaming EWMA: the exact recurrence as keyed state
# ---------------------------------------------------------------------------

EWMA_OUTPUT = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("ewma", DoubleType(), True),
        StructField("n_ticks", LongType(), True),
    ]
)

EWMA_STATE = StructType(
    [
        StructField("ewma", DoubleType(), True),
        StructField("n", LongType(), True),
    ]
)


def make_ewma_fn(alpha: float):
    """Stateful EWMA update: s ← α·x + (1-α)·s, seeded by the first tick.

    The batch operator deliberately uses the BOUNDED-lag form
    (operators/timeseries.py:ewma_bounded) because the infinite-memory
    recurrence is a sequential scan over history; in streaming the
    recurrence is natural — history is already folded into one scalar of
    state, and each micro-batch folds its (time-ordered) ticks on top.
    """

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        ewma, n = state.get if state.exists else (None, 0)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            allpdf = pd.concat(frames).sort_values(
                ["ts", "tiebreak"], kind="mergesort"
            )
            for x in allpdf["value"]:
                ewma = x if ewma is None else alpha * x + (1.0 - alpha) * ewma
            n += len(allpdf)
        state.update((ewma, n))
        yield pd.DataFrame({"ticker": [key[0]], "ewma": [ewma], "n_ticks": [n]})

    return fn


def running_ewma(ticks: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Per-ticker exact-recurrence EWMA over a stream: emits the updated
    value every micro-batch; state is one scalar per key (bounded
    regardless of stream length), checkpoint-durable."""
    return (
        ticks.select("ticker", "ts", "tiebreak", "value")
        .groupBy("ticker")
        .applyInPandasWithState(
            make_ewma_fn(alpha),
            outputStructType=EWMA_OUTPUT,
            stateStructType=EWMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
