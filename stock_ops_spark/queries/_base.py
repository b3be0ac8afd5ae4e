"""The engine's query library — driver-contract surface.

Each entry is a pair: a PySpark DataFrame program and a DuckDB-runnable
ANSI-SQL twin producing the identical result (row count, column names,
values).  Conventions that make the hash comparison robust:

- every computed column is explicitly aliased, identically on both sides
- integer outputs are cast to BIGINT on both sides (DuckDB ``sum(BIGINT)``
  is HUGEINT, Spark ``size()`` is INT — both normalized)
- floating aggregates are rounded AFTER ordering decisions, and always AT
  OR BEYOND the data's decimal precision: revenue = 2dp-price x 2dp-factor
  is exact at 4 decimals, so round(...,2) lands on true .xx5 boundaries
  where engine summation order flips the cent; round(...,4) never does
- dates/timestamps are emitted as formatted strings
- top-k orderings always carry a unique tiebreak column

Operator IDs in docstrings refer to SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_ops_spark import catalog
from stock_ops_spark.functions import text as TXT
from stock_ops_spark.functions import vector as V
from stock_ops_spark.operators.asof import asof_join_nearest
from stock_ops_spark.operators.dedup import minhash_near_dup_pairs_cached
from stock_ops_spark.operators.multimodal import media_from_text, metadata_only_stats
from stock_ops_spark.operators.ohlc import session_ohlc
from stock_ops_spark.operators.similarity import ivf_topk, knn_join
from stock_ops_spark.operators.versioning import latest_version_view

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        import functools

        from stock_ops_spark.shipping import ensure_package_on_executors

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Python workers import this package by reference when a
            # query uses mapInPandas/UDFs; the grading driver's cwd is
            # not ours, so ship the package first (idempotent, ~ms).
            ensure_package_on_executors(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load(spark, sf_dir, name)


def _local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Tiny driver-local relation as a true LocalTableScan (r12, guide
    §2/§5).  ``createDataFrame(list)`` parallelizes ANY list into an
    RDD (``defaultParallelism`` slices), so a ≤dozen-row audit result
    or rate table pays task launches + a Python-worker roundtrip per
    action (~0.3 s idle, multi-second under load waves — measured in
    the r12 q306 job trace).  Routing the rows through an Arrow table
    plans as ``LocalTableScan`` instead — no RDD, no Python eval at
    action time (measured 0.83 s → 0.11 s per action on a 10-row
    relation).  Values, schema and every downstream plan operator are
    unchanged; see ``stock_ops_spark.localrel``."""
    from stock_ops_spark.localrel import local_relation

    return local_relation(spark, rows, schema)


def _rev4() -> Column:
    """Discounted lineitem revenue in exact integer ten-thousandths
    (2dp price × 2dp discount factor ⇒ 4dp exact) — the q01/q185
    discipline, shared by the TPC-H-shape batch q235+."""
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("bigint")


def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared near-dup pair artifact (id_a, id_b, jaccard ≥ 0.5) over the
    documents corpus — materialized once per source dataset
    (minhash_near_dup_pairs_cached) and read by q21/q70/q86/q108, the
    same one-fit-many-readers discipline as the k-means centroids."""
    return minhash_near_dup_pairs_cached(
        _t(spark, sf_dir, "documents"),
        source_path=catalog.table_path(sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
    )


