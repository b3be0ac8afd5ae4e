"""Skew utilities: salted aggregation and salted join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_ops_spark.operators.skew import salted_agg, salted_join, with_salt


def test_with_salt_range_and_determinism(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    s1 = with_salt(df, 8).collect()
    s2 = with_salt(df, 8).collect()
    assert {r["__salt"] for r in s1} <= set(range(8))
    assert sorted((r.k, r["__salt"]) for r in s1) == sorted((r.k, r["__salt"]) for r in s2)


def test_salted_agg_matches_plain(spark):
    # one hot key (90% of rows) + long tail
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = salted_agg(
        df,
        ["k"],
        {
            "n": (F.count(F.lit(1)), F.sum("n").cast("long")),
            "total": (F.sum("v"), F.round(F.sum("total"), 6)),
            "mx": (F.max("v"), F.max("mx")),
        },
        buckets=16,
    )
    got = {r.k: (r.n, r.total, r.mx) for r in out.collect()}
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 6).alias("total"),
        F.max("v").alias("mx"),
    )
    want = {r.k: (r.n, r.total, r.mx) for r in plain.collect()}
    assert got == want


def test_salted_join_matches_plain(spark):
    large = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(10)],
        "k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("missing", "M")], "k string, tag string"
    )
    out = salted_join(large, small, ["k"], buckets=4)
    assert out.count() == 510
    assert {r.tag for r in out.collect()} == {"H", "C"}
    # left join preserves unmatched large rows
    large2 = large.union(spark.createDataFrame([("orphan", 1)], "k string, v long"))
    left = salted_join(large2, small, ["k"], buckets=4, how="left")
    orphan = [r for r in left.collect() if r.k == "orphan"]
    assert len(orphan) == 1 and orphan[0].tag is None


def test_grid_self_pairs_exact_on_skewed_blocks(spark):
    """Grid decomposition must emit exactly the naive self-join's pair set
    on a skew-hot fixture, and the physical join key must carry the grid
    cells so no task owns a whole block's quadratic pair square."""
    from stock_ops_spark.operators.similarity import grid_self_pairs

    # one hot label (40 rows → 780 pairs) + tail labels
    rows = [(i, "hot") for i in range(40)] + [(100 + i, f"t{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, label string")

    got = {
        (r.label, r.a.vec_id, r.b.vec_id)
        for r in grid_self_pairs(df, ["label"], grid=4).collect()
    }
    a = df.select(F.col("vec_id").alias("ia"), "label")
    b = df.select(F.col("vec_id").alias("ib"), "label")
    want = {
        (r.label, r.ia, r.ib)
        for r in a.join(b, "label").where(F.col("ia") < F.col("ib")).collect()
    }
    assert got == want and len(want) == 780 + 3 * 3

    # plan: the equi-join key includes the grid cells, not label alone
    plan = grid_self_pairs(df, ["label"], grid=4)._jdf.queryExecution().toString()
    assert "ga" in plan and "gb" in plan
