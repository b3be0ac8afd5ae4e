"""Unit tests for greedy sequence packing (operators/packing.py)."""

from __future__ import annotations

from stock_ops_spark.operators.packing import pack_sequences


def _pack(spark, rows, capacity):
    df = spark.createDataFrame(rows, "shard string, ord long, sz long")
    out = pack_sequences(df, "shard", "ord", "sz", capacity=capacity)
    return {(r["shard"], r["ord"]): (r["bin_id"], r["offset"]) for r in out.collect()}

def test_greedy_fill_and_reset(spark):
    rows = [("a", 1, 200), ("a", 2, 200), ("a", 3, 200), ("a", 4, 100)]
    got = _pack(spark, rows, 512)
    # 200+200 fits; +200 would be 600 -> new bin; +100 fits there
    assert got[("a", 1)] == (0, 0)
    assert got[("a", 2)] == (0, 200)
    assert got[("a", 3)] == (1, 0)
    assert got[("a", 4)] == (1, 200)


def test_oversized_item_gets_own_bin(spark):
    rows = [("a", 1, 100), ("a", 2, 900), ("a", 3, 100)]
    got = _pack(spark, rows, 512)
    assert got[("a", 1)] == (0, 0)
    assert got[("a", 2)] == (1, 0)   # overflow item opens its own bin
    assert got[("a", 3)] == (2, 0)   # and closes it immediately


def test_shards_pack_independently(spark):
    rows = [("a", 1, 500), ("b", 1, 500), ("b", 2, 500)]
    got = _pack(spark, rows, 512)
    assert got[("a", 1)] == (0, 0)
    assert got[("b", 1)] == (0, 0)
    assert got[("b", 2)] == (1, 0)


def test_exact_capacity_boundary_fits(spark):
    rows = [("a", 1, 256), ("a", 2, 256), ("a", 3, 1)]
    got = _pack(spark, rows, 512)
    assert got[("a", 2)] == (0, 256)  # cum == capacity exactly: fits
    assert got[("a", 3)] == (1, 0)


def test_packing_invariants_property(spark):
    """Property: greedy packing preserves order, never overfills a bin
    with more than one item, assigns contiguous bin ids from 0, and the
    offset always equals the running fill."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=40),
        st.integers(min_value=100, max_value=600),
    )
    def check(sizes, capacity):
        rows = [("s", i, sz) for i, sz in enumerate(sizes)]
        df = spark.createDataFrame(rows, "shard string, ord long, sz long")
        out = sorted(
            (r["ord"], r["bin_id"], r["offset"], r["sz"])
            for r in pack_sequences(df, "shard", "ord", "sz", capacity=capacity).collect()
        )
        # replay reference greedy walk
        bin_id, cum = 0, 0
        for i, (ordv, b, off, sz) in enumerate(out):
            assert ordv == i  # order preserved, nothing lost
            if i > 0 and cum + sz > capacity:
                bin_id, cum = bin_id + 1, 0
            assert b == bin_id
            assert off == cum
            cum += sz
            # a bin only exceeds capacity when it holds a single oversize item
            if cum > capacity:
                assert off == 0

    check()
