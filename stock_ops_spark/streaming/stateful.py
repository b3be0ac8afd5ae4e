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


# ---------------------------------------------------------------------------
# transformWithState: Spark 4's typed-state successor API
# ---------------------------------------------------------------------------

PROFILE_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
        StructField("n_event_types", LongType(), True),
    ]
)


def make_profile_processor():
    """Per-user running activity profile on ``transformWithStateInPandas``
    — Spark 4's successor to ``applyInPandasWithState``.  What the new
    API buys at scale, demonstrated here:

    - **typed state variables** instead of one monolithic state tuple:
      a ``ValueState`` for the scalar aggregate and a ``MapState`` for
      the per-event-type histogram.  Under the RocksDB provider
      (session.py), MapState keys are separate store entries — updating
      one event-type count no longer rewrites the whole state blob,
      which is the difference between O(1) and O(|state|) writes per
      key per batch on wide histograms.
    - state schemas declared as DDL strings per variable, so state
      evolution (adding a variable) does not invalidate the checkpoint
      of the others.
    - the same processor object also supports timers
      (``handle.registerTimer``) and per-variable TTL — not used here.

    Deferred import + class definition: the class body references the
    pyspark StatefulProcessor ABC, and workers unpickle this by VALUE
    (the factory closure ships the definition), so a driver running from
    any cwd works — same discipline as operators/multimodal.py.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningUserProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n bigint, total double, mx double"
            )
            self._types = handle.getMapState(
                "types", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, mx = self._agg.get() or (0, 0.0, None)
            for pdf in rows:
                valid = pdf.dropna(subset=["value"])
                n += len(valid)
                total += float(valid["value"].sum())
                if len(valid):
                    m = float(valid["value"].max())
                    mx = m if mx is None else max(mx, m)
                for et, cnt in valid["event_type"].value_counts().items():
                    k = (et,)
                    prev = (
                        self._types.getValue(k)[0]
                        if self._types.containsKey(k)
                        else 0
                    )
                    self._types.updateValue(k, (prev + int(cnt),))
            self._agg.update((n, total, mx))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                    "n_event_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return RunningUserProfile()


PROFILE_STATE = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
        StructField("mx", DoubleType(), True),
        StructField("ets", ArrayType(StringType()), True),
        StructField("ns", ArrayType(LongType()), True),
    ]
)


def _profile_fn_legacy(key, pdfs: Iterator, state: GroupState) -> Iterator:
    """applyInPandasWithState twin of the TWS profile processor —
    identical semantics, one monolithic state tuple (the histogram rides
    as parallel arrays, rewritten whole each update: exactly the write
    amplification the TWS MapState removes)."""
    import pandas as pd

    n, total, mx, ets, ns = (
        state.get if state.exists else (0, 0.0, None, [], [])
    )
    hist = dict(zip(ets, ns))
    for pdf in pdfs:
        valid = pdf.dropna(subset=["value"])
        n += len(valid)
        total += float(valid["value"].sum())
        if len(valid):
            m = float(valid["value"].max())
            mx = m if mx is None else max(mx, m)
        for et, cnt in valid["event_type"].value_counts().items():
            hist[et] = hist.get(et, 0) + int(cnt)
    state.update((n, total, mx, list(hist.keys()), list(hist.values())))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
            "n_event_types": [len(hist)],
        }
    )


def tws_available() -> bool:
    """transformWithState's state-server protocol is protobuf-based; the
    sandbox image ships no ``google.protobuf``, so the TWS path is
    environment-gated exactly like media codecs (operators/multimodal.py)
    — the operator code is real and the fallback is semantics-identical."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_profile(events: DataFrame, engine: str = "auto") -> DataFrame:
    """Per-user running (n, Σvalue, max, distinct-type count) over a
    stream; emits the updated profile for each key every micro-batch
    (Update mode).  Batch twin for tests/oracles: ``batch_user_profile``.

    ``engine='tws'`` uses ``transformWithStateInPandas`` (typed state,
    RocksDB column families — the scale path); ``'legacy'`` uses
    ``applyInPandasWithState``; ``'auto'`` picks TWS when its protobuf
    dependency exists in the environment.
    """
    if engine == "auto":
        engine = "tws" if tws_available() else "legacy"
    # Match batch_user_profile / the q122 oracle exactly: a user whose
    # events are all null-valued must not appear at all (the processors'
    # dropna alone would still emit an n_events=0 row for such a user).
    sel = events.select("user_id", "event_type", "value").where(
        F.col("value").isNotNull()
    )
    if engine == "tws":
        return sel.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=make_profile_processor(),
            outputStructType=PROFILE_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    return sel.groupBy("user_id").applyInPandasWithState(
        _profile_fn_legacy,
        outputStructType=PROFILE_OUTPUT,
        stateStructType=PROFILE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_profile(events: DataFrame) -> DataFrame:
    """Ground truth the streaming profile must equal after draining."""
    valid = events.where(F.col("value").isNotNull())
    return valid.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: sharded Misra-Gries state across micro-batches
# ---------------------------------------------------------------------------

HH_OUTPUT = StructType(
    [
        StructField("shard", LongType(), False),
        StructField("key", StringType(), True),
        StructField("est", LongType(), True),
        StructField("n_seen", LongType(), True),
    ]
)

HH_STATE = StructType(
    [
        StructField("keys", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("n_seen", LongType(), True),
    ]
)


def make_hh_fn(capacity: int):
    """Per-shard Misra-Gries state folded across micro-batches.

    The streaming twin of ``operators/heavyhitters.py``: a key hashes
    to exactly ONE shard, so a key absent from its shard's summary has
    true count <= n_seen_shard/(capacity+1) — the same certificate as
    the batch operator, now maintained continuously.  State per shard
    is capped at ``capacity`` counters FOREVER, whatever the stream's
    vocabulary does; each micro-batch re-emits the shard's summary
    (update mode), so a downstream foreachBatch always has the current
    candidates + the error bound in one snapshot."""
    from stock_ops_spark.operators.heavyhitters import _mg_update

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        shard = key[0]
        if state.exists:
            keys, counts, n_seen = state.get
            counters = dict(zip(list(keys), [int(c) for c in counts]))
            n_seen = int(n_seen)
        else:
            counters, n_seen = {}, 0
        for pdf in pdfs:
            grouped = pdf["key"].value_counts(dropna=True)
            for k, w in grouped.items():
                n_seen += int(w)
                _mg_update(counters, k, int(w), capacity)
        state.update((list(counters.keys()), [int(v) for v in counters.values()], n_seen))
        yield pd.DataFrame(
            {
                "shard": shard,
                "key": list(counters.keys()),
                "est": [int(v) for v in counters.values()],
                "n_seen": n_seen,
            }
        )

    return fn


def running_heavy_hitters(
    keyed: DataFrame, capacity: int = 1024, n_shards: int = 8
) -> DataFrame:
    """Continuous candidate tracking for top-k over an open vocabulary.

    ``keyed`` needs one string column ``key`` (tokens, URLs, user
    agents).  Keys are hash-sharded so state parallelizes across
    ``n_shards`` tasks while each key's count stays whole within one
    shard; per-shard state is a bounded Misra-Gries summary carried in
    the state store across micro-batches and restarts.  Memory bound:
    n_shards x capacity counters TOTAL, independent of stream length —
    the property that makes a trillion-token stream trackable where a
    streaming groupBy-count's state grows with the vocabulary."""
    sharded = keyed.select(
        F.pmod(F.xxhash64("key"), F.lit(n_shards)).alias("shard"), "key"
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_hh_fn(capacity),
        outputStructType=HH_OUTPUT,
        stateStructType=HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
