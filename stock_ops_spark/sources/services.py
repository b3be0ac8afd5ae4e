"""Ingestion services: the S1/S2 entry points rebuilt Spark-first.

The reference's historical task (``eodhd_historical_service.py:160-210``)
fetches REST bars, transforms row-at-a-time, and emits each row through the
Redis buffer to the writer.  Here the whole tail collapses: fetch →
``spark.createDataFrame`` → declarative transform (sources/transform.py) →
``ParquetStore.ingest_batch`` (dedup/version/stats in one shot).

The streaming task drains the provider's frame iterator into the store the
same way — or, for a live deployment, frames land in files/Kafka and
``streaming.ingest.stream_ingest`` takes over with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from stock_ops_spark.localrel import local_relation
from stock_ops_spark.schemas import INTERDAY_INTERVALS
from stock_ops_spark.sources import resilience as R
from stock_ops_spark.sources import transform as X
from stock_ops_spark.sources.ingest import ParquetStore
from stock_ops_spark.sources.providers import get as get_provider

_INTERDAY_RAW = (
    "date string, open double, high double, low double, close double, "
    "adjusted_close double, volume long"
)
_INTRADAY_RAW = (
    "timestamp long, open double, high double, low double, close double, volume long"
)
_TRADE_RAW = "s string, t long, p double, v long"
_QUOTE_RAW = "s string, t long, ap double, bp double, `as` long, bs long"


def run_historical_task(
    spark: SparkSession,
    store: ParquetStore,
    provider: str,
    ticker: str,
    exchange: str,
    interval: str,
    start: str,
    end: str,
    retry: "R.RetryPolicy | None" = None,
) -> int:
    """S1: fetch + normalize + ingest one historical request.
    Returns rows appended.

    With ``retry`` set, the fetch runs under the reference's REST
    hardening (bounded retries + backoff, sources/resilience.py); the
    provider may also register ``fetch_fallback`` as the one-shot
    alternate transport (the IPv6 re-resolution analog)."""
    p = get_provider(provider)
    if p.fetch_historical is None:
        raise ValueError(f"provider {provider!r} has no historical fetcher")
    if retry is not None:
        raw_rows = R.fetch_with_retry(
            p.fetch_historical,
            ticker,
            exchange,
            interval,
            start,
            end,
            policy=retry,
            fallback=p.fetch_fallback,
        )
    else:
        raw_rows = p.fetch_historical(ticker, exchange, interval, start, end)

    if interval in INTERDAY_INTERVALS:
        raw = local_relation(spark, raw_rows, _INTERDAY_RAW)
        normalized, _rejects = X.interday(raw, ticker, interval)
        mode = "historical_interday"
    else:
        raw = local_relation(spark, raw_rows, _INTRADAY_RAW)
        normalized, _rejects = X.intraday(raw, ticker, interval)
        mode = "historical_intraday"
    return store.ingest_batch(normalized, mode)


def run_stream_task(
    spark: SparkSession,
    store: ParquetStore,
    provider: str,
    tickers: list[str],
    exchange: str,
    stream_type: str = "trades",
    max_frames: int | None = None,
    duration: float | None = None,
    reconnect: "R.RetryPolicy | None" = None,
) -> int:
    """S2 (bounded drain form): pull frames from the provider's iterator,
    normalize per shape, ingest as one micro-batch.  The unbounded live
    form is streaming.ingest.stream_ingest over a file/Kafka landing zone.

    With ``reconnect`` set (optionally plus a global ``duration`` bound),
    the iterator runs under the reference's WebSocket reconnect/backoff
    loop (sources/resilience.py) — connection drops re-dial and frames
    arrive at-least-once; the store's dedup writer downstream makes the
    counts effectively-once."""
    p = get_provider(provider)
    if p.stream_frames is None:
        raise ValueError(f"provider {provider!r} has no stream source")
    if reconnect is not None:
        source = R.resilient_frames(
            lambda: p.stream_frames(tickers, exchange, stream_type),
            duration=duration,
            policy=reconnect,
        )
    else:
        # only dial when it will actually be consumed: a non-generator
        # provider opens its connection at call time
        source = p.stream_frames(tickers, exchange, stream_type)
    frames = []
    for i, frame in enumerate(source):
        frames.append(frame)
        if max_frames is not None and i + 1 >= max_frames:
            break
    if not frames:
        return 0
    if stream_type == "quotes":
        raw = local_relation(spark, frames, _QUOTE_RAW)
        normalized, _rejects = X.quotes(raw)
    else:
        raw = local_relation(spark, frames, _TRADE_RAW)
        normalized, _rejects = X.trades(raw)
    return store.ingest_batch(normalized, "streaming")


def run_command(
    spark: SparkSession,
    store: ParquetStore,
    command_type: str,
    command: dict,
    provider: str = "EODHD-mock",
    retry: "R.RetryPolicy | None" = None,
) -> int:
    """Controller twin (reference controller.py:9-39 +
    data_pipeline_flow.py:13-31): dispatch one orchestration command dict
    to the matching service.  Command shapes follow the reference exactly
    — historical: {ticker, exchange, interval, start, end}; streaming:
    {tickers, exchange, stream_type, duration}.  Returns rows appended.

    The reference's exactly-one-service invariant becomes an explicit
    command_type check; unknown types raise (the Prefect flow's
    ValueError path)."""
    if command_type == "fetch_historical":
        return run_historical_task(
            spark,
            store,
            provider,
            ticker=command["ticker"],
            exchange=command["exchange"],
            interval=command["interval"],
            start=command["start"],
            end=command["end"],
            retry=retry,
        )
    if command_type == "drain_stream":
        # Engine extension: scheduled micro-batch drain of a file
        # landing zone — cron-style streaming.  The reference's
        # start_stream holds a long-lived socket; a parquet-lake
        # deployment often prefers periodic availableNow drains with
        # the SAME checkpoint + dedup contract (offsets in the
        # checkpoint progress exactly-once; the idempotent writer makes
        # redelivered rows effectively-once).  Command: {path,
        # checkpoint, mode?, max_files_per_trigger?}.  Returns rows
        # appended (post-dedup), observed from the store's delta hook.
        from stock_ops_spark.streaming.ingest import (
            file_trade_source,
            stream_ingest,
        )

        appended = {"n": 0}

        def _count_delta(delta, _mode):
            appended["n"] += delta.count()

        source = file_trade_source(
            spark,
            command["path"],
            max_files_per_trigger=int(command.get("max_files_per_trigger", 1)),
        )
        store.observers.append(_count_delta)
        try:
            q = stream_ingest(
                source,
                store,
                mode=command.get("mode", "streaming"),
                checkpoint=command["checkpoint"],
                available_now=True,
            )
            q.awaitTermination()
        finally:
            store.observers.remove(_count_delta)
        return appended["n"]
    if command_type == "maintain_store":
        # Engine extension (no reference analog: the reference trims its
        # Redis buffer inline at write time, writer.py:35-37,293-297 —
        # a parquet store runs maintenance as SCHEDULED jobs, which is
        # exactly what the scheduling module dispatches here).  Command:
        # {op: compact|retain|widen_types, mode: <store mode>, ...args}.
        # Returns a job-size integer so the scheduler's run log stays
        # uniform (files coalesced away / partitions dropped / files
        # rewritten).
        from stock_ops_spark.sources import maintenance as M

        op = command["op"]
        mode = command["mode"]
        if op == "compact":
            res = M.compact(
                store,
                mode,
                target_file_bytes=int(
                    command.get("target_file_bytes", 128 << 20)
                ),
            )
            return res["files_before"] - res["files_after"]
        if op == "retain":
            return len(M.retain(store, mode, tuple(command["keep_from"])))
        if op == "widen_types":
            return M.widen_types(store, mode).get("files_rewritten", 0)
        raise ValueError(f"Unsupported maintenance op: {op!r}")
    if command_type == "start_stream":
        tickers = command["tickers"]
        if isinstance(tickers, str):
            tickers = [tickers]  # reference wraps the scalar the same way
        return run_stream_task(
            spark,
            store,
            provider,
            tickers=tickers,
            exchange=command["exchange"],
            stream_type=command.get("stream_type", "trades"),
            max_frames=command.get("max_frames"),
            duration=command.get("duration"),
            reconnect=retry,
        )
    raise ValueError(f"Unsupported command type: {command_type!r}")

def run_historical_backfill(
    spark: SparkSession,
    store: ParquetStore,
    provider: str,
    tickers: list[str],
    exchange: str,
    interval: str,
    start: str,
    end: str,
    retries: int = 0,
) -> int:
    """S1 at backfill scale: the executor-side twin of
    ``run_historical_task``.  The ``stockops_rest`` Python DataSource
    (sources/pyds.py) fetches one ticker per InputPartition on the
    executors — the driver never holds a payload and 5000 tickers
    fetch with cluster parallelism — then the same P1 normalization
    and dedup/version ingest apply.  Returns rows appended."""
    from stock_ops_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    raw = (
        spark.read.format("stockops_rest")
        .option("provider", provider)
        .option("tickers", ",".join(tickers))
        .option("exchange", exchange)
        .option("interval", interval)
        .option("start", start)
        .option("end", end)
        .option("retries", str(retries))
        .load()
    )
    if interval in INTERDAY_INTERVALS:
        normalized, _rejects = X.interday(raw, None, interval)
        mode = "historical_interday"
    else:
        normalized, _rejects = X.intraday(raw, None, interval)
        mode = "historical_intraday"
    return store.ingest_batch(normalized, mode)
