"""As-of (nearest-timestamp) join.

The reference's J2 pattern (``local_reader_manual.py:261-262``) looks up the
trade nearest a session bound with pandas ``(ts - bound).abs().argmin()``.
The general distributed form implemented here is a *backward* as-of join
(each left row matched to the latest right row with ``right.ts <= left.ts``),
plus a "nearest" variant.

Spark-first strategy (scales to 100 TB):
- union the two sides tagged by origin, partitioned by the join keys
- one window pass ordered by timestamp carries the most recent right-side
  value forward onto left rows (``last(..., ignorenulls=True)``)
This is a single shuffle on (keys) — no O(n·m) cross product, no UDF, and
it inherits AQE skew handling.  The pandas ``merge_asof`` equivalent exists
for per-group application via ``applyInPandas`` but is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _numeric_on(df: DataFrame, on: str):
    """Return a Column→Column transform that maps the ``on`` column (and
    window expressions derived from it) to a distance-comparable numeric.

    Timestamp flavors (TIMESTAMP and TIMESTAMP_NTZ — parquet encoding
    drift must not break the operator) go through
    ``unix_micros(to_timestamp(c))``: ``to_timestamp`` is the identity on
    TIMESTAMP and a UTC reinterpretation on NTZ under the pinned-UTC
    session, and ``unix_micros`` keeps long arithmetic (a raw double cast
    is illegal on NTZ and loses µs precision above 2^53 anyway).
    Numerics pass through as double.
    """
    dt = df.schema[on].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return lambda c: F.unix_micros(F.to_timestamp(c))
    return lambda c: c.cast("double")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` (within ``by`` groups).

    Returns the left rows with ``{val}{suffix}`` columns appended (null when
    no prior right row exists).
    """
    by = by or []
    rvals = right_value_cols or [c for c in right.columns if c != on and c not in by]

    lcols = left.columns
    ltag = left.withColumn("__side", F.lit(1))
    rtag = right.select(
        *by, on, *[F.col(c).alias(f"{c}{suffix}") for c in rvals]
    ).withColumn("__side", F.lit(0))

    unioned = ltag.unionByName(rtag, allowMissingColumns=True)
    # Right rows sort before left rows at the same timestamp so an exactly
    # co-timestamped right row IS visible to the left row (<=, not <).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in rvals
    ]
    out = unioned.select(
        *[F.col(c) for c in lcols if c in unioned.columns], F.col("__side"), *carried
    )
    return out.where(F.col("__side") == 1).drop("__side")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Nearest-timestamp variant (argmin |left.ts − right.ts|), the exact
    reference semantics.  Implemented as backward ∪ forward carry and a
    final least-distance pick — still two window passes over one shuffle."""
    by = by or []
    rvals = right_value_cols or [c for c in right.columns if c != on and c not in by]

    lcols = left.columns
    ltag = left.withColumn("__side", F.lit(1))
    rtag = right.select(
        *by,
        F.col(on),
        F.col(on).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    ).withColumn("__side", F.lit(0))
    unioned = ltag.unionByName(rtag, allowMissingColumns=True)

    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back_ts = F.last("__rts", ignorenulls=True).over(wb)
    fwd_ts = F.first("__rts", ignorenulls=True).over(wf)
    picks = [
        (
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(wb),
            F.first(F.col(f"__r_{c}"), ignorenulls=True).over(wf),
        )
        for c in rvals
    ]
    num = _numeric_on(unioned, on)
    back_dist = F.abs(num(F.col(on)) - num(back_ts))
    fwd_dist = F.abs(num(fwd_ts) - num(F.col(on)))
    # backward wins ties (pandas argmin picks the first minimal element)
    use_back = back_ts.isNotNull() & (fwd_ts.isNull() | (back_dist <= fwd_dist))

    out_cols = [F.col(c) for c in lcols]
    for (b, f), c in zip(picks, rvals):
        out_cols.append(F.when(use_back, b).otherwise(f).alias(f"{c}{suffix}"))
    return (
        unioned.select(F.col("__side"), *out_cols)
        .where(F.col("__side") == 1)
        .drop("__side")
    )


def asof_cogroup_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_value_col: str,
    out_col: str = "nearest_value",
    n_buckets: int = 64,
) -> DataFrame:
    """Cogrouped-pandas twin of ``asof_join_nearest`` (backward wins
    exact distance ties — the same convention as the window form).

    Exists for the per-group-imperative escape hatch: when the match rule
    outgrows what a window carry can express (validity intervals, per-key
    tolerances), this shape takes arbitrary pandas logic while keeping the
    exchange a single co-partitioning, Arrow-batched, never a collect.

    Scale shape: cogrouping on the RAW key hands Python one tiny batch
    pair per key — at millions of keys the per-group Arrow+invoke
    overhead dwarfs the work (measured 8.4 s for ~20k keys at sf0.1).
    So both sides are co-partitioned on ``hash(by) % n_buckets`` and each
    bucket is merged with a group-aware vectorized
    ``pd.merge_asof(by=...)`` — identical per-key semantics, but the
    Python boundary is crossed n_buckets times instead of n_keys times
    (measured ~4x faster at sf0.1; per-group cost is ~8 ms of Arrow +
    invoke overhead, so size n_buckets to ~2x the cores, not to the
    key count).  For the plain nearest rule prefer the window form: it
    stays entirely JVM-side."""
    import numpy as np
    import pandas as pd

    lcols = left.columns
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields
    )
    out_schema = f"{fields}, {out_col} double"
    imax = np.iinfo(np.int64).max

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.drop(columns="__bkt")
        if len(l) == 0:
            return pd.DataFrame(columns=[*lcols, out_col])
        l = l.sort_values(on, kind="mergesort", ignore_index=True)
        if len(r) == 0:
            l[out_col] = np.nan
            return l
        r = r.drop(columns="__bkt").sort_values(
            "__r_on", kind="mergesort", ignore_index=True
        )
        rby = [f"__r_{c}" for c in by]
        b = pd.merge_asof(
            l, r, left_on=on, right_on="__r_on",
            left_by=by, right_by=rby, direction="backward",
        )
        f = pd.merge_asof(
            l, r, left_on=on, right_on="__r_on",
            left_by=by, right_by=rby, direction="forward",
        )
        lts = l[on].astype("int64").to_numpy()
        bok = b["__r_on"].notna().to_numpy()
        fok = f["__r_on"].notna().to_numpy()
        # NaT sentinels are int64-min: mask BEFORE subtracting so the
        # distance arithmetic never wraps
        bts = np.where(bok, b["__r_on"].astype("int64").to_numpy(), 0)
        fts = np.where(fok, f["__r_on"].astype("int64").to_numpy(), 0)
        bdist = np.where(bok, lts - bts, imax)
        fdist = np.where(fok, fts - lts, imax)
        use_back = bok & (~fok | (bdist <= fdist))
        l[out_col] = np.where(
            use_back, b["__r_val"].to_numpy(), f["__r_val"].to_numpy()
        )
        return l

    # Alias EVERY right-side column (keys included) to FRESH names: when
    # both sides descend from the same source plan, clashing attribute
    # ids are deduplicated out of the right cogroup batch (observed: the
    # right pdf arriving without its `on`/key columns); aliasing forces
    # new ids.
    rsel = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in by],
        F.col(on).alias("__r_on"),
        F.col(right_value_col).alias("__r_val"),
    )
    lbkt = F.pmod(F.xxhash64(*by), F.lit(n_buckets))
    rbkt = F.pmod(F.xxhash64(*[f"__r_{c}" for c in by]), F.lit(n_buckets))
    return (
        left.withColumn("__bkt", lbkt)
        .groupBy("__bkt")
        .cogroup(rsel.withColumn("__bkt", rbkt).groupBy("__bkt"))
        .applyInPandas(merge, schema=out_schema)
    )
