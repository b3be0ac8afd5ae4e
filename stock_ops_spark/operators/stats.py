"""Incremental table/interval statistics (reference A5/A6).

The reference maintains ``__table_stats__`` (row_count, min/max ts, min/max
date) and ``__interval_stats__`` (the same, grouped by interval) per DB
file, merged O(1) per batch (``sql_db.py:540-669``).  Parquet footers
already carry per-file min/max, but the engine still exposes the same
*catalog view*: a tiny stats parquet per dataset, merged per ingested
batch with one aggregate + one coalesced overwrite — never a rescan of the
store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_ops_spark.schemas import TS_COL


def batch_stats(batch: DataFrame, mode: str, by_interval: bool) -> DataFrame:
    """One aggregate over the (already small) ingest batch: row_count and
    min/max of the mode's timestamp column, per ticker (and interval)."""
    ts_col = TS_COL[mode]
    keys = ["ticker", "interval"] if by_interval else ["ticker"]
    ts = F.col(ts_col)
    if mode == "historical_interday":
        lo, hi = F.min(ts.cast("string")), F.max(ts.cast("string"))
    else:
        lo, hi = F.min(ts), F.max(ts)
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("row_count"),
        lo.alias("min_ts"),
        hi.alias("max_ts"),
    )


def merge_stats(existing: DataFrame | None, delta: DataFrame, keys: list[str]) -> DataFrame:
    """O(1)-per-key merge of a batch's stats into the running stats
    (reference update_min_max, sql_db.py:34-40)."""
    if existing is None:
        return delta
    e = existing.select(
        *keys,
        F.col("row_count").alias("__rc"),
        F.col("min_ts").alias("__lo"),
        F.col("max_ts").alias("__hi"),
    )
    return (
        delta.join(e, on=keys, how="full_outer")
        .select(
            *keys,
            (F.coalesce(F.col("row_count"), F.lit(0)) + F.coalesce(F.col("__rc"), F.lit(0))).alias(
                "row_count"
            ),
            F.least(F.col("min_ts"), F.col("__lo")).alias("min_ts"),
            F.greatest(F.col("max_ts"), F.col("__hi")).alias("max_ts"),
        )
    )


class StatsTable:
    """A small parquet-backed stats catalog for one dataset."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys

    def read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def update(self, delta: DataFrame) -> None:
        existing = self.read()
        merged = merge_stats(existing, delta, self.keys)
        # merged's plan reads self.path, which we are about to overwrite —
        # sever lineage first (read-then-overwrite hazard), then write the
        # tiny result as a single file
        merged = merged.localCheckpoint(eager=True)
        merged.coalesce(1).write.mode("overwrite").parquet(self.path)
