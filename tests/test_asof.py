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


def test_nearest_asof_type_robust_on_ntz(spark):
    """The operator must be type-robust ON ITS OWN: NTZ-typed event time
    (the encoding Spark 4.1 infers from untagged parquet) must give the
    identical match set, without relying on catalog.load having
    normalized upstream — distance math goes through
    unix_micros(to_timestamp(...)), never a raw double cast (illegal on
    NTZ)."""
    l, r = _dfs(spark)
    to_ntz = F.timestamp_micros((F.col("ts") * 1_000_000)).cast("timestamp_ntz")
    l_ntz = l.withColumn("ts", to_ntz)
    r_ntz = r.withColumn("ts", to_ntz)
    out = {
        row.id: row.val_right
        for row in asof_join_nearest(l_ntz, r_ntz, on="ts", by=["user"]).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: 10.0, 4: 30.0}


def test_asof_empty_right(spark):
    l, _ = _dfs(spark)
    empty = spark.createDataFrame([], "user string, ts long, val double")
    rows = asof_join_backward(l, empty, on="ts", by=["user"]).collect()
    assert len(rows) == len(LEFT) and all(r.val_right is None for r in rows)


def test_cogroup_nearest_matches_window_form(spark, sf_dir):
    """The cogrouped-pandas as-of and the union+window as-of are two
    physical strategies for one operator — results must be identical."""
    from pyspark.sql import functions as F

    from stock_ops_spark import catalog
    from stock_ops_spark.operators.asof import asof_cogroup_nearest, asof_join_nearest

    ev = catalog.load(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    a = {
        r["event_id"]: r["pval_right"]
        for r in asof_join_nearest(
            signups, purchases, on="ts", by=["user_id"], right_value_cols=["pval"]
        ).collect()
    }
    b = {
        r["event_id"]: r["nearest_value"]
        for r in asof_cogroup_nearest(
            signups, purchases, on="ts", by=["user_id"], right_value_col="pval"
        ).collect()
    }
    assert a == b


def test_cogroup_nearest_empty_right_group_yields_null(spark):
    import datetime as dt

    from stock_ops_spark.operators.asof import asof_cogroup_nearest

    base = dt.datetime(2024, 1, 1)
    l = spark.createDataFrame(
        [(1, 1, base), (2, 2, base)], "event_id long, user_id long, ts timestamp"
    )
    r = spark.createDataFrame([(1, base, 5.0)], "user_id long, ts timestamp, pval double")
    got = {
        row["event_id"]: row["nearest_value"]
        for row in asof_cogroup_nearest(
            l, r, on="ts", by=["user_id"], right_value_col="pval"
        ).collect()
    }
    assert got[1] == 5.0
    assert got[2] is None
