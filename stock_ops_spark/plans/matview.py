"""Incrementally-maintained materialized aggregate views.

Spark has no built-in incremental view maintenance: a ``CREATE VIEW``
re-runs its full plan per query, and Structured Streaming aggregations
live inside one streaming query's state store.  This module maintains a
grouped-aggregate table UNDER ANY ingest path (batch ``ingest_batch``
calls, streaming ``foreachBatch`` micro-batches, backfills) by folding
each appended delta into a tiny persisted partial-aggregate table —
O(|delta| + |groups touched|) per refresh, never a rescan of the store.

Supported measures are the ADDITIVE partials: ``sum``, ``count``,
``min``, ``max`` (and anything derivable from them at read time — avg,
rates, spans — via ``serve``).  Additivity is what makes maintenance a
pure fold; it also dictates the contract:

- **Append-only.**  A retraction or in-place update is not expressible
  with additive partials (min/max cannot un-see a value).  Wire the view
  to the POST-dedup delta the store computes (``ParquetStore``'s
  ``observers`` hook hands over exactly the rows that entered the store,
  exactly once) — never to raw pre-dedup batches, which replay on
  checkpoint recovery.
- **Crash safety** comes from ``StatsTable``'s two-rename swap install
  (write ``.tmp`` → aside → install), reused via its ``merge_fn`` hook:
  a SIGKILL at any point leaves the previous or the next generation
  whole.  The one open window (delta appended, fold killed before
  install) is healed by ``rebuild`` — same analysis as the stats
  catalog's, ``operators/stats.py``.

At 100 TB the point of the MV is the read side: a dashboard query over
the view touches |groups| rows instead of the fact table; the write-side
fold aggregates only the micro-batch.  Reference parity: the reference
has no MV layer (its stats tables, ``sql_db.py:540-669``, are the
closest analog — this generalizes that fold to arbitrary grouped
measures).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_ops_spark.operators.stats import StatsTable

# measure kind -> (partial aggregate over delta, pairwise combine)
_KINDS = {
    "sum": (
        lambda e: F.sum(e),
        lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    ),
    "count": (
        lambda e: F.count(F.lit(1)),
        lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    ),
    # least/greatest are null-skipping for 2 args only when wrapped:
    # coalesce(least(a,b), a, b) returns the non-null one if either is
    "min": (
        lambda e: F.min(e),
        lambda a, b: F.coalesce(F.least(a, b), a, b),
    ),
    "max": (
        lambda e: F.max(e),
        lambda a, b: F.coalesce(F.greatest(a, b), a, b),
    ),
}


class MatView:
    """One materialized grouped-aggregate view.

    ``measures`` maps output column -> ``(kind, sql_expr)`` with kind in
    {sum, count, min, max}; ``sql_expr`` is any row-level SQL expression
    over the fact's columns (ignored for count).  Example::

        mv = MatView(spark, path, ["ticker", "interval"], {
            "n":        ("count", None),
            "vol_sum":  ("sum",   "volume"),
            "px_cents": ("sum",   "CAST(round(close * 100) AS BIGINT)"),
            "hi":       ("max",   "high"),
        })
        mv.refresh(delta)                 # per ingested delta
        mv.serve(avg_px="px_cents / n")   # derived columns at read time
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: list[str],
        measures: dict[str, tuple[str, str | None]],
    ):
        for name, (kind, _expr) in measures.items():
            if kind not in _KINDS:
                raise ValueError(
                    f"measure {name!r}: kind {kind!r} not additive — "
                    f"supported: {sorted(_KINDS)}"
                )
        self.spark = spark
        self.group_cols = list(group_cols)
        self.measures = dict(measures)
        self._table = StatsTable(
            spark, path, keys=self.group_cols, merge_fn=self._merge
        )

    # -- maintenance -----------------------------------------------------
    def _partial(self, delta: DataFrame) -> DataFrame:
        aggs = []
        for name, (kind, expr) in self.measures.items():
            part, _ = _KINDS[kind]
            src = F.lit(1) if kind == "count" else F.expr(expr)
            aggs.append(part(src).alias(name))
        return delta.groupBy(*self.group_cols).agg(*aggs)

    def _merge(
        self, existing: DataFrame | None, delta: DataFrame, keys: list[str]
    ) -> DataFrame:
        if existing is None:
            return delta
        e = existing.select(
            *keys, *[F.col(m).alias(f"__e_{m}") for m in self.measures]
        )
        cols = [F.col(k) for k in keys]
        for name, (kind, _expr) in self.measures.items():
            _, combine = _KINDS[kind]
            cols.append(
                combine(F.col(name), F.col(f"__e_{name}")).alias(name)
            )
        return delta.join(e, on=keys, how="full_outer").select(*cols)

    def refresh(self, delta: DataFrame) -> None:
        """Fold one appended delta into the view (one partial aggregate
        over the delta + one O(groups) merge + swap install)."""
        self._table.update(self._partial(delta))

    def observer(self) -> Callable[[DataFrame, str], None]:
        """Adapter for ``ParquetStore(observers=[...])``: ignores the
        mode argument and folds every post-dedup delta."""
        return lambda delta, _mode: self.refresh(delta)

    def rebuild(self, fact: DataFrame) -> None:
        """Maintenance-time heal / first fill: one full aggregate of the
        fact table, installed atomically (replaces, never folds)."""
        self._install_full(fact)

    def _install_full(self, fact: DataFrame) -> None:
        import os
        import shutil

        full = self._partial(fact).localCheckpoint(eager=True)
        t = self._table
        shutil.rmtree(t._tmp, ignore_errors=True)
        shutil.rmtree(t._aside, ignore_errors=True)
        full.coalesce(1).write.mode("overwrite").parquet(t._tmp)
        if os.path.exists(t.path):
            os.rename(t.path, t._aside)
        os.rename(t._tmp, t.path)
        shutil.rmtree(t._aside, ignore_errors=True)

    # -- read ------------------------------------------------------------
    def read(self) -> DataFrame | None:
        """The raw partial-aggregate table (None before the first fold)."""
        return self._table.read()

    def serve(self, **derived: str) -> DataFrame | None:
        """The view plus derived columns (SQL over the partials), e.g.
        ``serve(avg_px="px_cents / n / 100")``."""
        df = self.read()
        if df is None:
            return None
        for name, expr in derived.items():
            df = df.withColumn(name, F.expr(expr))
        return df
