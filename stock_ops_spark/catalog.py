"""Table catalog over a scale-factor directory of parquet files.

The driver testdata layout is one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md).  At 100 TB the same
code works unchanged over a directory tree of many files per table —
``spark.read.parquet`` handles multi-file listing, partition discovery and
pruning natively (this replaces the reference's hand-rolled filename
enumeration, reference ``src/stockops/data/utils.py:79-99``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Column pruning + predicate pushdown reach the scan
    because we return the raw declarative reader output.

    The driver testdata stores ``events.ts`` as parquet TIMESTAMP(NANOS),
    which Spark 4 rejects by default; we read nanos as long (runtime conf)
    and rebuild a microsecond TimestampType column via integer division
    (``ts DIV 1000`` stays in long arithmetic — float division rounds for
    epoch-ns values above 2^53, off-by-1µs vs the DuckDB oracle).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf may be static on some builds
        pass
    df = spark.read.parquet(table_path(sf_dir, name))
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)
