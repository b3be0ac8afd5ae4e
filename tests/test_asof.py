"""As-of join unit tests: backward carry, nearest tie-breaking, co-ts
visibility, empty right side."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_ops_spark.operators.asof import asof_join_backward, asof_join_nearest

LEFT = [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 100)]
RIGHT = [("u", 100, 10.0), ("u", 200, 20.0), ("v", 150, 30.0)]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "id long, user string, ts long")
    r = spark.createDataFrame(RIGHT, "user string, ts long, val double")
    return l, r


def test_backward_asof(spark):
    l, r = _dfs(spark)
    out = {
        row.id: row.val_right
        for row in asof_join_backward(l, r, on="ts", by=["user"]).collect()
    }
    assert out[1] == 10.0  # co-timestamped right row visible (<=)
    assert out[2] == 20.0  # latest right at-or-before 205
    assert out[3] is None  # nothing before 50
    assert out[4] is None  # v's right row is AFTER 100


def test_nearest_asof_tiebreak(spark):
    l, r = _dfs(spark)
    out = {
        row.id: row.val_right
        for row in asof_join_nearest(l, r, on="ts", by=["user"]).collect()
    }
    assert out[1] == 10.0  # exact match
    assert out[2] == 20.0  # 205 nearest 200
    assert out[3] == 10.0  # forward fallback when nothing behind
    assert out[4] == 30.0  # v: only forward
    # equidistant: ts=150 between 100 and 200 → backward wins
    mid = spark.createDataFrame([(9, "u", 150)], "id long, user string, ts long")
    got = asof_join_nearest(mid, r, on="ts", by=["user"]).collect()[0]
    assert got.val_right == 10.0


def test_asof_empty_right(spark):
    l, _ = _dfs(spark)
    empty = spark.createDataFrame([], "user string, ts long, val double")
    rows = asof_join_backward(l, empty, on="ts", by=["user"]).collect()
    assert len(rows) == len(LEFT) and all(r.val_right is None for r in rows)
