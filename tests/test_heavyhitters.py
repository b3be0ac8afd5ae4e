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
