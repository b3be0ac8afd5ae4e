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
