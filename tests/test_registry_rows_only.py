"""UDF registration surface + rows-only queries (approx sketches,
streaming demo)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from stock_ops_spark import catalog
from stock_ops_spark.functions.registry import register_all
from stock_ops_spark.functions.text import quality_score

SF = "/root/testdata/sf0.001"


def test_registry_udfs_sql_callable(spark):
    names = register_all(spark)
    assert set(names) == {"quality_score_py", "cosine_sim_py", "token_count_py"}
    catalog.register_all(spark, SF)
    rows = spark.sql(
        "select doc_id, quality_score_py(text) q, token_count_py(text) tc "
        "from documents order by doc_id limit 5"
    ).collect()
    assert all(r.q is not None and 0.0 <= r.q <= 1.0 and r.tc > 0 for r in rows)


def test_pandas_udf_matches_jvm_quality(spark):
    """The Arrow UDF and the JVM expression implement the same heuristic."""
    register_all(spark)
    d = catalog.load(spark, SF, "documents").limit(50)
    both = d.select(
        F.expr("quality_score_py(text)").alias("py"),
        quality_score(F.col("text")).alias("jvm"),
    ).collect()
    for r in both:
        assert abs(r.py - r.jvm) < 1e-6, (r.py, r.jvm)


def test_rows_only_queries_run(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "q43_approx_distinct_sketch",
        "q44_approx_percentile_tdigest",
        "q45_streaming_bars_demo",
    }
    # approx sketches: within rsd bounds of the exact counts
    approx = {r.l_returnflag: r for r in qs["q43_approx_distinct_sketch"](spark, SF).collect()}
    exact = {
        r.l_returnflag: r
        for r in catalog.load(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"))
        .collect()
    }
    for k in exact:
        assert abs(approx[k].approx_parts - exact[k].p) / exact[k].p < 0.1


def test_streaming_demo_matches_batch_rowcount(spark):
    qs = E.queries()
    n_stream = qs["q45_streaming_bars_demo"](spark, SF).count()
    n_batch = qs["q20_hourly_event_bars"](spark, SF).count()
    assert n_stream == n_batch  # same windows derived streaming vs batch
