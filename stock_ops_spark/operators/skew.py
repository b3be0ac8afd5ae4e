"""Skew mitigation utilities.

AQE's skew-join splitting (on in session.py) handles most sort-merge skew
at runtime.  These helpers cover the cases AQE can't: skewed *aggregation*
keys and skewed broadcast-ineligible joins.

- ``salted_agg``: two-phase aggregation — partial aggregate on
  (key, salt), then final merge on key.  Turns one hot key's single
  reducer into ``salt_buckets`` parallel reducers.  Works for any algebraic
  aggregate (sum/count/min/max expressed as partials).
- ``salted_join``: replicate the small side ``salt_buckets`` times and salt
  the large side uniformly — joins a hot-keyed fact against a dim too big
  to broadcast without one reducer owning the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform deterministic-per-row salt in [0, buckets) — derived from a
    hash of all columns rather than rand() so retries/replays stay stable."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (partial_agg_expr, merge_agg_expr), e.g.
    ``{"n": (F.count(F.lit(1)), F.sum("n")), "mx": (F.max("v"), F.max("mx"))}``.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the large side, replicate the small side
    across all salt values, join on (keys + salt).  Memory cost: small side
    × buckets; wall-clock win: the hot key spreads over ``buckets``
    reducers."""
    l_salted = with_salt(large, buckets)
    s_replicated = small.join(
        F.broadcast(
            small.sparkSession.range(buckets).select(
                F.col("id").cast("long").alias("__salt")
            )
        )
    )
    out = l_salted.join(s_replicated, on + ["__salt"], how)
    return out.drop("__salt")
