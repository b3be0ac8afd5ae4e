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
from pyspark.errors import AnalysisException

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
    """A small parquet-backed stats catalog for one dataset.

    Crash safety: ``update`` materializes the merged stats into a
    sibling ``.tmp`` directory and installs it with two renames (the
    ``streaming/dedup.py`` swap discipline) — a SIGKILL at ANY point
    leaves either the old or the new stats directory whole, never a
    half-written directory that poisons readers with
    UNABLE_TO_INFER_SCHEMA (caught live by the hard-kill test in
    ``tests/test_crash_recovery.py``).  ``read`` additionally adopts a
    completed-but-uninstalled ``.tmp`` / restores a stranded ``.old``
    so a kill BETWEEN the two renames loses nothing.

    One window remains inherently open with plain parquet (no commit
    log): a kill after the data append but before the stats merge
    leaves the catalog one batch behind the store — the replay dedups
    the rows away, so the skipped merge never re-fires.  ``rebuild``
    heals that by re-aggregating the store (bounded, maintenance-time
    only); Delta/Iceberg close it with a transaction log, plain
    parquet cannot.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        merge_fn=None,
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        # (existing|None, delta, keys) -> merged.  Defaults to the
        # min/max/row_count stats merge; MatView reuses this table's
        # crash-safe swap machinery with an additive-measure merge.
        self.merge_fn = merge_fn or merge_stats

    @property
    def _tmp(self) -> str:
        return self.path + ".tmp"

    @property
    def _aside(self) -> str:
        return self.path + ".old"

    # A SIGKILL-torn parquet file always lacks its footer (the footer is
    # written at close), so footer-read failure IS the torn-write signal.
    _TORN_MARKERS = (
        "UNABLE_TO_INFER_SCHEMA",
        "PATH_NOT_FOUND",
        "CANNOT_READ_FILE_FOOTER",
        "FAILED_READ_FILE",
    )

    def _readable(self, path: str) -> DataFrame | None:
        try:
            df = self.spark.read.parquet(path)
            df.schema  # force footer read so debris fails HERE
            return df
        except Exception as e:  # AnalysisException or Py4JJavaError footer error
            if any(m in str(e) for m in self._TORN_MARKERS):
                return None
            raise

    def read(self) -> DataFrame | None:
        import shutil

        if os.path.exists(self.path):
            df = self._readable(self.path)
            if df is not None:
                # healthy install — drop any swap debris from a crash
                shutil.rmtree(self._tmp, ignore_errors=True)
                shutil.rmtree(self._aside, ignore_errors=True)
                return df
            # torn directory (legacy in-place overwrite killed mid-write):
            # fall through to the recovery candidates
            shutil.rmtree(self.path, ignore_errors=True)
        # killed between the two renames: tmp is complete (it is written
        # before any rename) — adopt it; else a stranded aside is the
        # last whole generation — restore it
        for cand in (self._tmp, self._aside):
            if os.path.exists(cand):
                df = self._readable(cand)
                if df is not None:
                    os.rename(cand, self.path)
                    shutil.rmtree(self._tmp, ignore_errors=True)
                    shutil.rmtree(self._aside, ignore_errors=True)
                    return self.spark.read.parquet(self.path)
                shutil.rmtree(cand, ignore_errors=True)
        return None

    def update(self, delta: DataFrame) -> None:
        import shutil

        existing = self.read()
        merged = self.merge_fn(existing, delta, self.keys)
        # merged's plan reads self.path, which the swap below replaces —
        # sever lineage first, then write the tiny result as one file
        merged = merged.localCheckpoint(eager=True)
        shutil.rmtree(self._tmp, ignore_errors=True)
        shutil.rmtree(self._aside, ignore_errors=True)
        merged.coalesce(1).write.mode("overwrite").parquet(self._tmp)
        if os.path.exists(self.path):
            os.rename(self.path, self._aside)
        os.rename(self._tmp, self.path)
        shutil.rmtree(self._aside, ignore_errors=True)

    def rebuild(self, store_df: DataFrame, mode: str, by_interval: bool) -> None:
        """Maintenance-time heal: recompute the catalog from the store
        itself (one full aggregate — bounded, never on the hot path)."""
        import shutil

        full = batch_stats(store_df, mode, by_interval)
        full = full.localCheckpoint(eager=True)
        shutil.rmtree(self._tmp, ignore_errors=True)
        shutil.rmtree(self._aside, ignore_errors=True)
        full.coalesce(1).write.mode("overwrite").parquet(self._tmp)
        if os.path.exists(self.path):
            os.rename(self.path, self._aside)
        os.rename(self._tmp, self.path)
        shutil.rmtree(self._aside, ignore_errors=True)
