"""Bucketed table twins: build-once caching, cross-session re-attach,
and the shuffle-elimination plans that are the entire point.

Plan pins use the executed plan string (AQE final) — the claims are
"zero Exchange below the join" and "SelectedBucketsCount" pruning,
both invisible in the logical plan.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_ops_spark import catalog
from stock_ops_spark.sources.bucketing import bucketed_twin

SF = "/root/testdata/sf0.001"


def _twins(spark, tmp_cache):
    o = bucketed_twin(
        spark,
        catalog.load(spark, SF, "orders"),
        catalog.table_path(SF, "orders"),
        "t_orders",
        ["o_orderkey"],
        8,
        cache_dir=tmp_cache,
    )
    li = bucketed_twin(
        spark,
        catalog.load(spark, SF, "lineitem"),
        catalog.table_path(SF, "lineitem"),
        "t_lineitem",
        ["l_orderkey"],
        8,
        cache_dir=tmp_cache,
    )
    return o, li


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("bucket_cache"))


def _executed(df) -> str:
    df.collect()  # force AQE to finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString appends the pre-AQE "== Initial Plan =="
    # section after the final plan — keep only the final physical tree.
    return plan.split("== Initial Plan ==")[0]


def _file_census(cache_dir: str) -> dict[str, float]:
    out = {}
    for root, _dirs, files in os.walk(cache_dir):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def test_twin_round_trips_and_caches(spark, cache_dir):
    o, _ = _twins(spark, cache_dir)
    src = catalog.load(spark, SF, "orders")
    assert o.count() == src.count()
    assert sorted(o.columns) == sorted(src.columns)
    census = _file_census(cache_dir)
    # committed twin = bucket files renamed into a non-.tmp dir (the
    # session skips _SUCCESS markers; the dir rename is the commit)
    assert any(f.endswith(".parquet") and ".tmp" not in f for f in census)
    assert not any(".tmp" in f for f in census)
    # second call: same session → catalog hit, zero writes
    o2, _ = _twins(spark, cache_dir)
    assert o2.count() == src.count()
    assert _file_census(cache_dir) == census


def test_reattach_after_catalog_loss(spark, cache_dir):
    """New session / process: files survive, DDL re-attaches, no rewrite."""
    _twins(spark, cache_dir)
    census = _file_census(cache_dir)
    for t in spark.catalog.listTables():
        if t.name.startswith("bkt_t_"):
            spark.sql(f"DROP TABLE {t.name}")
    o, li = _twins(spark, cache_dir)
    assert _file_census(cache_dir) == census  # re-attach only, no write
    assert o.count() == catalog.load(spark, SF, "orders").count()
    assert li.count() == catalog.load(spark, SF, "lineitem").count()


def test_join_is_shuffle_free(spark, cache_dir):
    o, li = _twins(spark, cache_dir)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
            "o_orderkey", "l_linenumber"
        )
        plan = _executed(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_join_matches_plain_parquet_join(spark, cache_dir):
    o, li = _twins(spark, cache_dir)
    bucketed = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    po = catalog.load(spark, SF, "orders")
    pl = catalog.load(spark, SF, "lineitem")
    plain = (
        po.join(pl, po["o_orderkey"] == pl["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_agg_on_bucket_key_is_shuffle_free(spark, cache_dir):
    _, li = _twins(spark, cache_dir)
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed(per_key)
    assert "Exchange" not in plan, plan


def test_point_filter_prunes_to_one_bucket(spark, cache_dir):
    o, _ = _twins(spark, cache_dir)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        some_key = o.select("o_orderkey").head()[0]
        q = o.where(F.col("o_orderkey") == F.lit(some_key))
        plan = _executed(q)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(key, old)


def test_registry_bucketed_queries_shuffle_shape(spark):
    """q269: the only Exchanges are ABOVE the join (the 5-row rollup
    and final sort); the join itself is exchange-free — in the
    top-down plan string that means no Exchange AFTER the
    SortMergeJoin line.  q270: exactly one hash Exchange — the
    histogram rollup; the per-orderkey aggregate rides the bucketed
    distribution (the final orderBy's range exchange is allowed)."""
    from stock_ops_spark import queries as Q

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan269 = _executed(Q.QUERIES["q269_bucketed_priority_rollup"](spark, SF))
        smj = plan269.index("SortMergeJoin")
        assert "Exchange" not in plan269[smj:], plan269
        plan270 = _executed(
            Q.QUERIES["q270_bucketed_linecount_histogram"](spark, SF)
        )
        assert plan270.count("Exchange hashpartitioning") == 1, plan270
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
