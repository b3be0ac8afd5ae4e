"""stock_ops_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference stock-market data pipeline (jfaa-josh/stock-ops) on idiomatic
PySpark: DataFrame/SQL + Catalyst for batch analytics, partitioned Parquet
for storage, Structured Streaming for live ingest.

Modules
-------
- ``session``    SparkSession builder (UTC, AQE, tuned shuffle partitions)
- ``schemas``    fixed StructTypes for the four record kinds + test tables
- ``catalog``    table loading / registration over a scale-factor directory
- ``functions``  scalar column helpers (time, text, vector math)
- ``operators``  the operator library (OHLC, as-of join, dedup, versioning,
                 similarity search, stats)
- ``sources``    batch ingest with reference dedup/version semantics and the
                 partition-pruned read API
- ``streaming``  Structured Streaming ingest + derived bars
"""

__version__ = "0.1.0"
