"""Incremental materialized views (plans/matview.py): fold-equals-
recompute equivalence, derived serving, dedup-aware integration through
the store observer hook, and crash-state recovery via the shared
StatsTable swap machinery."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_ops_spark import schemas as S
from stock_ops_spark.plans.matview import MatView
from stock_ops_spark.sources.ingest import ParquetStore

MEASURES = {
    "n": ("count", None),
    "vol": ("sum", "CAST(volume AS BIGINT)"),
    "px_cents": ("sum", "CAST(round(close * 100) AS BIGINT)"),
    "hi": ("max", "high"),
    "lo": ("min", "low"),
}


def _mv(spark, tmp_path) -> MatView:
    return MatView(spark, str(tmp_path / "mv"), ["ticker"], MEASURES)


def _rows(seed: int):
    # deterministic batch generator: overlapping tickers across batches
    out = []
    for i in range(20):
        t = ["SPY", "VOO", "QQQ"][(seed + i) % 3]
        ts = 1751463000 + 3600 * (seed * 20 + i)
        px = 100.0 + ((seed * 7 + i * 13) % 900) / 10.0
        out.append((t, ts, px, px + 1.0, px - 1.0, px + 0.5, 100 + i, "1h"))
    return out


def test_fold_equals_full_recompute(spark, tmp_path):
    mv = _mv(spark, tmp_path)
    batches = [
        spark.createDataFrame(_rows(s), schema=S.HISTORICAL_INTRADAY)
        for s in range(4)
    ]
    for b in batches:
        mv.refresh(b)
    full = batches[0]
    for b in batches[1:]:
        full = full.unionByName(b)
    expect = {
        r["ticker"]: r.asDict()
        for r in mv._partial(full).collect()
    }
    got = {r["ticker"]: r.asDict() for r in mv.read().collect()}
    assert got == expect


def test_serve_derives_from_partials(spark, tmp_path):
    mv = _mv(spark, tmp_path)
    mv.refresh(spark.createDataFrame(_rows(0), schema=S.HISTORICAL_INTRADAY))
    served = mv.serve(avg_px="round(px_cents / n / 100.0, 4)").collect()
    for r in served:
        assert abs(r.avg_px - r.px_cents / r.n / 100.0) < 1e-6


def test_rejects_non_additive_measure(spark, tmp_path):
    with pytest.raises(ValueError, match="not additive"):
        MatView(spark, str(tmp_path / "x"), ["t"], {"med": ("median", "v")})


def test_observer_sees_post_dedup_delta_only(spark, tmp_path):
    """The store hands the MV exactly the rows that entered the store:
    replaying the same batch (checkpoint-recovery shape) must NOT
    double-count, because the dedup empties the second delta."""
    mv = _mv(spark, tmp_path)
    store = ParquetStore(
        spark, str(tmp_path / "store"), observers=[mv.observer()]
    )
    batch = spark.createDataFrame(_rows(1), schema=S.HISTORICAL_INTRADAY)
    n1 = store.ingest_batch(batch, "historical_intraday")
    assert n1 == 20
    n2 = store.ingest_batch(batch, "historical_intraday")  # full replay
    assert n2 == 0
    counts = {r.ticker: r.n for r in mv.read().collect()}
    assert sum(counts.values()) == 20  # folded once, not twice


def test_view_matches_store_after_mixed_ingest(spark, tmp_path):
    """End-to-end: after several batches with partial overlap, the view
    equals a full recompute over what the STORE holds."""
    mv = _mv(spark, tmp_path)
    store = ParquetStore(
        spark, str(tmp_path / "store"), observers=[mv.observer()]
    )
    for s in range(3):
        rows = _rows(s) + _rows(max(0, s - 1))[:5]  # 5-row replay overlap
        store.ingest_batch(
            spark.createDataFrame(rows, schema=S.HISTORICAL_INTRADAY),
            "historical_intraday",
        )
    stored = store.read_all("historical_intraday")
    expect = {
        r["ticker"]: r.asDict() for r in mv._partial(stored).collect()
    }
    got = {r["ticker"]: r.asDict() for r in mv.read().collect()}
    assert got == expect


def test_rebuild_replaces_not_folds(spark, tmp_path):
    mv = _mv(spark, tmp_path)
    b = spark.createDataFrame(_rows(2), schema=S.HISTORICAL_INTRADAY)
    mv.refresh(b)
    mv.refresh(b)  # wired to raw batches by mistake: double-counted
    assert sum(r.n for r in mv.read().collect()) == 40
    mv.rebuild(b)  # heal: full replace
    assert sum(r.n for r in mv.read().collect()) == 20


def test_swap_debris_recovery(spark, tmp_path):
    """A kill between the two install renames leaves .tmp complete and
    the main path absent — read() must adopt it (shared StatsTable
    discipline, exercised through the MV's own table)."""
    import os

    mv = _mv(spark, tmp_path)
    mv.refresh(spark.createDataFrame(_rows(0), schema=S.HISTORICAL_INTRADAY))
    t = mv._table
    os.rename(t.path, t._tmp)  # simulate: installed gen back to .tmp
    assert mv.read() is not None
    assert os.path.exists(t.path) and not os.path.exists(t._tmp)
    assert sum(r.n for r in mv.read().collect()) == 20


def test_manifest_store_observer_fires_after_commit(spark, tmp_path):
    """ManifestStore parity: observers see each committed delta exactly
    once, and a replayed batch (empty delta) folds nothing."""
    from stock_ops_spark.sources.commitlog import ManifestStore

    mv = _mv(spark, tmp_path)
    store = ManifestStore(
        spark, str(tmp_path / "mstore"), observers=[mv.observer()]
    )
    batch = spark.createDataFrame(_rows(3), schema=S.HISTORICAL_INTRADAY)
    assert store.ingest_batch(batch, "historical_intraday") == 20
    assert store.ingest_batch(batch, "historical_intraday") == 0
    assert sum(r.n for r in mv.read().collect()) == 20
    stored = store.read_all("historical_intraday")
    expect = {r["ticker"]: r.asDict() for r in mv._partial(stored).collect()}
    got = {r["ticker"]: r.asDict() for r in mv.read().collect()}
    assert got == expect


def test_streaming_ingest_maintains_view(spark, tmp_path):
    """The MV rides the streaming path untouched: stream_ingest →
    foreachBatch → ingest_batch → observer.  Checkpointed replay of an
    already-seen burst folds nothing (effectively-once extends to the
    view)."""
    import json

    from stock_ops_spark.streaming.ingest import (
        file_trade_source,
        stream_ingest,
    )

    trades = [
        {"ticker": "SPY", "timestamp_UTC_ms": 1755526571834,
         "price": 643.155, "volume": 10},
        {"ticker": "SPY", "timestamp_UTC_ms": 1755526600000,
         "price": 643.20, "volume": 4},
        {"ticker": "SPY", "timestamp_UTC_ms": 1755526600000,
         "price": 643.20, "volume": 4},  # dup collapses
        {"ticker": "VOO", "timestamp_UTC_ms": 1755526610000,
         "price": 590.00, "volume": 2},
    ]
    src = tmp_path / "socket"
    src.mkdir()
    with open(src / "burst1.json", "w") as f:
        for r in trades:
            f.write(json.dumps(r) + "\n")

    mv = MatView(
        spark,
        str(tmp_path / "mv"),
        ["ticker"],
        {"n": ("count", None), "vol": ("sum", "CAST(volume AS BIGINT)")},
    )
    store = ParquetStore(
        spark, str(tmp_path / "store"), observers=[mv.observer()]
    )
    q = stream_ingest(
        file_trade_source(spark, str(src)),
        store,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    got = {r.ticker: (r.n, r.vol) for r in mv.read().collect()}
    assert got == {"SPY": (2, 14), "VOO": (1, 2)}

    # replayed burst → empty post-dedup delta → view unchanged
    with open(src / "burst2.json", "w") as f:
        for r in trades[:2]:
            f.write(json.dumps(r) + "\n")
    q2 = stream_ingest(
        file_trade_source(spark, str(src)),
        store,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    got = {r.ticker: (r.n, r.vol) for r in mv.read().collect()}
    assert got == {"SPY": (2, 14), "VOO": (1, 2)}
