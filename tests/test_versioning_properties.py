"""Property-based tests (hypothesis) for dedup/versioning invariants.

The reference tests only a fixed golden fixture; these verify the
semantics hold for arbitrary batches:

1. no (key, payload) pair is ever stored twice
2. versions per key are exactly 1..n (contiguous, no gaps)
3. input order never changes the stored (key, payload, version) set
4. re-ingesting any previously ingested batch appends nothing
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stock_ops_spark import schemas as S
from stock_ops_spark.operators.versioning import assign_versions

KEYS = S.INDEX_COLS["streaming"]
PAYLOAD = S.payload_cols("streaming")

# small domains force key collisions and payload conflicts
row_strategy = st.tuples(
    st.sampled_from(["SPY", "VOO"]),                      # ticker
    st.sampled_from([1000, 2000, 3000]),                  # timestamp_UTC_ms
    st.sampled_from([None, 1.0, 2.0]),                    # price
    st.sampled_from([None, 5]),                           # volume
    st.sampled_from([None, 9.0]),                         # ask_price
    st.none(),                                            # bid_price
    st.none(),                                            # ask_size
    st.none(),                                            # bid_size
)


def _stored(spark, rows):
    df = spark.createDataFrame(rows, schema=S.STREAMING)
    out = assign_versions(df, None, KEYS, PAYLOAD)
    return [
        (r.ticker, r.timestamp_UTC_ms, r.price, r.volume, r.ask_price, r.version)
        for r in out.collect()
    ]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row_strategy, min_size=1, max_size=12), seed=st.integers(0, 3))
def test_versioning_invariants(spark, rows, seed):
    # drop rows whose payload is entirely None only from EXPECTATION—the
    # engine must do it itself
    stored = _stored(spark, rows)

    # 1. no duplicate (key, payload)
    kp = [(t, ts, p, v, a) for (t, ts, p, v, a, _ver) in stored]
    assert len(kp) == len(set(kp))

    # 2. versions contiguous 1..n per key
    by_key: dict = {}
    for t, ts, p, v, a, ver in stored:
        by_key.setdefault((t, ts), []).append(ver)
    for vers in by_key.values():
        assert sorted(vers) == list(range(1, len(vers) + 1))

    # 3. all-null payloads never stored
    assert all(
        not (p is None and v is None and a is None) for (_, _, p, v, a, _ver) in stored
    )

    # 4. order independence of the full stored set
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    assert set(stored) == set(_stored(spark, shuffled))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row_strategy, min_size=1, max_size=8))
def test_reingest_idempotent(spark, rows):
    df = spark.createDataFrame(rows, schema=S.STREAMING)
    first = assign_versions(df, None, KEYS, PAYLOAD).localCheckpoint(eager=True)
    again = assign_versions(df, first, KEYS, PAYLOAD)
    assert again.count() == 0
