"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship session-OHLC query on sf0.001;
``queries()``/``oracle_sql()`` expose the operator library from
``stock_ops_spark.queries`` (one entry per implemented SURVEY.md §2
operator, each with a DuckDB-oracle SQL twin where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stock_ops_spark import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q13_session_ohlc(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return dict(Q.ORACLES)
