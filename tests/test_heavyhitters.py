"""Misra–Gries heavy hitters: the MG guarantee, the two-pass exactness
certificate, and the refuse-to-lie path when the bound fails.

The registry query (q271) exercises the bounded-vocabulary regime; the
tests here drive the regime the operator exists for — skewed open
vocabularies larger than the summary capacity, where per-task state
stays capped and candidates still cover the true top-k.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_ops_spark.operators.heavyhitters import (
    _mg_update,
    exact_topk_via_mg,
    mg_summaries,
)


def _zipf_rows(n_keys=500, scale=2000):
    """Deterministic Zipf-ish multiset: key i appears scale//(i+1) times."""
    rows = []
    for i in range(n_keys):
        rows.extend([(f"k{i:04d}",)] * max(scale // (i + 1), 1))
    return rows


def test_mg_update_guarantee_unit():
    """Pure-python MG: estimate undercounts by at most N/(cap+1)."""
    import random

    rng = random.Random(7)
    stream = []
    for i in range(200):
        stream.extend([f"x{i}"] * (200 // (i + 1) + 1))
    rng.shuffle(stream)
    cap = 16
    counters: dict = {}
    for k in stream:
        _mg_update(counters, k, 1, cap)
    n = len(stream)
    true = {}
    for k in stream:
        true[k] = true.get(k, 0) + 1
    assert len(counters) <= cap
    for k, est in counters.items():
        assert est <= true[k]
        assert true[k] - est <= n // (cap + 1)
    # every key with true count > N/(cap+1) must be tracked
    for k, c in true.items():
        if c > n // (cap + 1):
            assert k in counters, (k, c, n // (cap + 1))


def test_mg_update_weighted_matches_repeated_units():
    """A weighted arrival is exactly a run of unit arrivals."""
    stream = [("a", 5), ("b", 3), ("c", 4), ("a", 2), ("d", 6), ("b", 1)]
    cap = 2
    weighted: dict = {}
    for k, w in stream:
        _mg_update(weighted, k, w, cap)
    unit: dict = {}
    for k, w in stream:
        for _ in range(w):
            _mg_update(unit, k, 1, cap)
    assert weighted == unit


def test_summaries_bounded_and_marker_total(spark):
    df = spark.createDataFrame(_zipf_rows(), "key string").repartition(6)
    cap = 32
    summ = mg_summaries(df, "key", cap).collect()
    markers = [r for r in summ if r["key"] is None]
    counters = [r for r in summ if r["key"] is not None]
    assert sum(r["est"] for r in markers) == df.count()
    # per-task state stayed bounded: no task can emit more than cap keys
    assert len(counters) <= 6 * cap


def test_exact_topk_matches_full_aggregation(spark):
    df = spark.createDataFrame(_zipf_rows(), "key string").repartition(6)
    got = exact_topk_via_mg(df, "key", k=10, capacity=256).collect()
    want = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
        .collect()
    )
    assert [(r["key"], r["cnt"]) for r in got] == [
        (r["key"], r["cnt"]) for r in want
    ]


def test_exact_topk_weighted(spark):
    df = spark.createDataFrame(
        [(f"k{i % 50:03d}", (i % 7) + 1) for i in range(5000)],
        "key string, w int",
    ).repartition(4)
    got = exact_topk_via_mg(
        df, "key", k=5, capacity=64, weight_col="w"
    ).collect()
    want = (
        df.groupBy("key")
        .agg(F.sum("w").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(5)
        .collect()
    )
    assert [(r["key"], r["cnt"]) for r in got] == [
        (r["key"], r["cnt"]) for r in want
    ]


def test_uncertifiable_raises(spark):
    """Near-uniform data with a tiny capacity: the k-th count falls
    under the MG bound and the operator must refuse, not guess."""
    df = spark.createDataFrame(
        [(f"u{i:05d}",) for i in range(20000)], "key string"
    ).repartition(4)
    with pytest.raises(ValueError, match="not certifiable"):
        exact_topk_via_mg(df, "key", k=3, capacity=8)


def test_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "key string"
    )
    got = exact_topk_via_mg(df, "key", k=2, capacity=16).collect()
    assert [(r["key"], r["cnt"]) for r in got] == [("a", 2), ("b", 1)]


def test_running_heavy_hitters_stream(spark, tmp_path):
    """Streaming twin: sharded MG state folded across micro-batches.
    After draining the stream, every key whose true count exceeds its
    shard's bound must be tracked, estimates never overcount, and
    per-shard state stays within capacity."""
    import json

    from pyspark.sql import functions as F  # noqa: F811
    from stock_ops_spark.streaming.stateful import running_heavy_hitters

    src = tmp_path / "stream"
    src.mkdir()
    # three bursts of zipf-ish words; burst = micro-batch
    words = []
    for i in range(120):
        words.extend([f"w{i:03d}"] * (120 // (i + 1)))
    third = len(words) // 3
    for b in range(3):
        with open(src / f"burst{b}.json", "w") as f:
            for w in words[b * third : (b + 1) * third if b < 2 else len(words)]:
                f.write(json.dumps({"key": w}) + "\n")

    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    cap, n_shards = 16, 4
    out = running_heavy_hitters(stream, capacity=cap, n_shards=n_shards)
    last = {}

    def sink(batch, _bid):
        for r in batch.collect():
            last.setdefault(r["shard"], {})
            # update-mode snapshot: latest batch per shard wins
        for shard in {r["shard"] for r in batch.collect()}:
            last[shard] = [
                r for r in batch.collect() if r["shard"] == shard
            ]

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    true = {}
    for w in words:
        true[w] = true.get(w, 0) + 1
    shard_of = {
        r["key"]: r["shard"]
        for r in spark.createDataFrame([(w,) for w in set(words)], "key string")
        .select(F.pmod(F.xxhash64("key"), F.lit(n_shards)).alias("shard"), "key")
        .collect()
    }
    shard_totals = {}
    for w, c in true.items():
        shard_totals[shard_of[w]] = shard_totals.get(shard_of[w], 0) + c

    tracked = {}
    for shard, rows in last.items():
        assert len(rows) <= cap  # bounded state per shard
        n_seen = {r["n_seen"] for r in rows}
        assert n_seen == {shard_totals[shard]}  # exact arrival accounting
        for r in rows:
            tracked[r["key"]] = r["est"]
            assert r["est"] <= true[r["key"]]  # never overcounts
            assert true[r["key"]] - r["est"] <= shard_totals[shard] // (cap + 1)
    for w, c in true.items():
        bound = shard_totals[shard_of[w]] // (cap + 1)
        if c > bound:
            assert w in tracked, (w, c, bound)


def test_fewer_candidates_than_k_with_nonzero_bound_raises(spark):
    """Pruning can leave fewer than k candidates while keys with true
    count <= bound were dropped — such a short list is NOT provably the
    top-k and must refuse (the r6 code silently returned it)."""
    rows = [("big",)] * 10000 + [(f"u{i:04d}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string").repartition(2)
    with pytest.raises(ValueError, match="not certifiable"):
        exact_topk_via_mg(df, "key", k=3, capacity=1)


def test_fewer_than_k_distinct_certifies_with_zero_bound(spark):
    """bound == 0 (capacity >= N) proves no key was pruned, so a short
    list IS the complete answer."""
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "key string")
    got = exact_topk_via_mg(df, "key", k=5, capacity=1000).collect()
    assert [(r["key"], r["cnt"]) for r in got] == [("a", 2), ("b", 1)]
