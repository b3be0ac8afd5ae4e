"""Technical-indicator operators over tick/bar streams.

Domain extension beyond the reference's ingest surface (the reference
stores ticks — `src/stockops/data/database/writer.py` — but computes no
indicators); these are the analytics a stock-ops user runs on the stored
table, expressed as single-shuffle window programs.

Scale notes (100 TB posture):
- every operator partitions its window by the instrument key, so the
  whole indicator pass is ONE hash-partition exchange on the key followed
  by an in-partition sort — the same layout the store already writes
  (ticker-partitioned, ts-clustered), so with a bucketed/partitioned
  source even that exchange disappears.
- all arithmetic is built-in column expressions (whole-stage codegen);
  no Python in the path.
- EWMA is the bounded-lag form: an exact weighted sum of the last N
  observations.  The infinite-memory recurrence is deliberately NOT used:
  it is a sequential scan per key (non-parallel over history) and its
  tail weight below N=32 lags is < (1-alpha)^32 — under the data's own
  noise floor.  Bounded lags keep the operator a pure window expression
  that Catalyst can pipeline with any other window on the same key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(key: str | Column, *order: str | Column) -> Window:
    return Window.partitionBy(key).orderBy(*order)


def bollinger(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str,
    n: int = 20,
    width: float = 2.0,
) -> DataFrame:
    """Rolling mean +- ``width`` sample-stddev bands over the trailing
    ``n`` rows per key, plus a band-breach flag for the current row.

    Rows earlier than position ``n`` still get bands over their shorter
    prefix (standard charting behavior); stddev of a 1-row frame is NULL,
    so the breach flag is NULL there — callers filter ``n_in_frame >= n``
    for the fully-warmed signal.
    """
    w = _w(key, ts, tiebreak).rowsBetween(-(n - 1), 0)
    mid = F.avg(value).over(w)
    sd = F.stddev_samp(value).over(w)
    return df.withColumns(
        {
            "bb_mid": mid,
            "bb_upper": mid + F.lit(width) * sd,
            "bb_lower": mid - F.lit(width) * sd,
            "n_in_frame": F.count(F.lit(1)).over(w),
            "bb_breach": F.when(F.col(value) > mid + F.lit(width) * sd, F.lit(1))
            .when(F.col(value) < mid - F.lit(width) * sd, F.lit(-1))
            .otherwise(F.lit(0)),
        }
    )


def max_drawdown(df: DataFrame, key: str, ts: str, value: str, tiebreak: str) -> DataFrame:
    """Per-key maximum drawdown: largest peak-to-trough fractional drop
    of ``value`` walking forward in time.

    Running peak is an unbounded-preceding window max (rank-ordered scan,
    no self-join); the drawdown aggregate then reuses the same partition,
    so the whole thing is one exchange on the key.
    """
    w = _w(key, ts, tiebreak).rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max(value).over(w)
    # a zero running peak (series opens at 0) makes drawdown undefined;
    # define it as 0 rather than tripping ANSI division-by-zero
    dd = F.when(peak != 0, (peak - F.col(value)) / peak).otherwise(F.lit(0.0))
    return (
        df.select(F.col(key), dd.alias("dd"), F.col(value).alias("v"))
        .groupBy(key)
        .agg(
            F.max("dd").alias("max_drawdown"),
            F.max("v").alias("peak_value"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def rsi(
    df: DataFrame, key: str, ts: str, value: str, tiebreak: str, n: int = 14
) -> DataFrame:
    """Wilder-free simple RSI: average gain vs average loss over the
    trailing ``n`` price changes (simple moving averages, the textbook
    Cutler variant — exact, order-stable, windowable).

    RSI = 100 - 100 / (1 + avg_gain / avg_loss); all-gain frames pin to
    100, all-loss to 0, flat frames to NULL (0/0).
    """
    ordw = _w(key, ts, tiebreak)
    diff = F.col(value) - F.lag(value, 1).over(ordw)
    frame = ordw.rowsBetween(-(n - 1), 0)
    d = df.withColumn("_chg", diff)
    gain = F.avg(F.greatest(F.col("_chg"), F.lit(0.0))).over(frame)
    loss = F.avg(F.greatest(-F.col("_chg"), F.lit(0.0))).over(frame)
    rsi_col = (
        F.when(F.col("_chg").isNull(), F.lit(None))
        .when((gain == 0) & (loss == 0), F.lit(None))
        .when(loss == 0, F.lit(100.0))
        .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + gain / loss))
    )
    return d.withColumns(
        {"rsi": rsi_col, "n_changes": F.count("_chg").over(frame)}
    ).drop("_chg")


def ewma_bounded(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str,
    alpha: float,
    n_lags: int,
    out: str = "ewma",
) -> DataFrame:
    """Exact bounded-window EWMA: normalized weighted sum of the current
    row and its ``n_lags`` predecessors with weights (1-alpha)^k.

    Unrolled into ``lag`` expressions — every term is a plain codegen
    column, the normalizer adapts at partition heads (missing lags drop
    out of both numerator and denominator), and the whole stack shares
    one window sort with any other per-key indicator.
    """
    ordw = _w(key, ts, tiebreak)
    beta = 1.0 - alpha
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(n_lags + 1):
        term = F.col(value) if k == 0 else F.lag(value, k).over(ordw)
        wgt = F.lit(beta**k)
        num = num + F.coalesce(term * wgt, F.lit(0.0))
        den = den + F.when(term.isNotNull(), wgt).otherwise(F.lit(0.0))
    return df.withColumn(out, num / den)


def vwap(df: DataFrame, group_cols: list[str], price: str, qty: str) -> DataFrame:
    """Volume-weighted average price per group: one hash aggregate with
    map-side partial sums — the batch twin of the streaming running-VWAP
    state op (streaming/stateful.py)."""
    return df.groupBy(*group_cols).agg(
        (F.sum(F.col(price) * F.col(qty)) / F.sum(qty)).alias("vwap"),
        F.sum(qty).alias("total_qty"),
        F.count(F.lit(1)).alias("n_trades"),
    )


def bollinger_chunked(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str,
    bucket: Column,
    n: int = 20,
    width: float = 2.0,
) -> DataFrame:
    """Skew-hardened Bollinger: identical output to ``bollinger`` but the
    window partitions on (key, bucket) instead of key alone, so ONE HOT
    INSTRUMENT no longer serializes into one task — the scale hazard of
    every per-key window (AQE cannot split a window partition).

    Mechanics: each bucket's last ``n-1`` rows are replicated into the
    NEXT non-empty bucket as carry-only history (they feed frames, they
    are not re-emitted), buckets are sequenced per key by dense_rank over
    the tiny distinct-bucket set, and the rolling frame runs inside
    (key, bucket_seq).

    Precondition: every (key, bucket) holds at least ``n-1`` rows —
    frames never span more than two buckets.  Pick the bucket so this
    holds by construction (a trading day vs an 8-tick band); with ticks
    that sparse, the plain per-key window has no skew problem to solve.
    """
    b = df.withColumn("__b", bucket)
    # per-key bucket sequence: the distinct-bucket set is tiny (days),
    # so this window ranks a frame orders of magnitude smaller than df
    seq = (
        b.select(key, "__b")
        .distinct()
        .withColumn(
            "__bseq",
            F.dense_rank().over(Window.partitionBy(key).orderBy("__b")),
        )
    )
    base = b.join(seq, [key, "__b"]).withColumn("__carry", F.lit(0))
    tail_w = Window.partitionBy(key, "__bseq").orderBy(
        F.col(ts).desc(), F.col(tiebreak).desc()
    )
    carry = (
        base.withColumn("__rn", F.row_number().over(tail_w))
        .where(F.col("__rn") <= n - 1)
        .drop("__rn")
        .withColumn("__bseq", F.col("__bseq") + 1)
        .withColumn("__carry", F.lit(1))
    )
    unioned = base.unionByName(carry)
    w = (
        Window.partitionBy(key, "__bseq")
        .orderBy(ts, tiebreak)
        .rowsBetween(-(n - 1), 0)
    )
    mid = F.avg(value).over(w)
    sd = F.stddev_samp(value).over(w)
    out = unioned.withColumns(
        {
            "bb_mid": mid,
            "bb_upper": mid + F.lit(width) * sd,
            "bb_lower": mid - F.lit(width) * sd,
            "n_in_frame": F.count(F.lit(1)).over(w),
            "bb_breach": F.when(F.col(value) > mid + F.lit(width) * sd, F.lit(1))
            .when(F.col(value) < mid - F.lit(width) * sd, F.lit(-1))
            .otherwise(F.lit(0)),
        }
    )
    # carried rows were history only; true frame size caps at n even
    # when carry rows pad the partition head
    return (
        out.where(F.col("__carry") == 0)
        .withColumn("n_in_frame", F.least(F.col("n_in_frame"), F.lit(n)))
        .drop("__b", "__bseq", "__carry")
    )


def max_drawdown_chunked(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str,
    bucket: Column,
) -> DataFrame:
    """Skew-hardened max drawdown: the UNBOUNDED running peak decomposes
    as a two-level parallel prefix — within-bucket running max plus an
    exclusive prefix-max over per-bucket maxima — so no window ever
    partitions on the bare key (``bollinger_chunked``'s hazard note).

    The cross-bucket pass windows the per-(key, bucket) summary frame —
    thousands of rows where the tick frame has billions — and unlike the
    frame-carry trick this decomposition is EXACT with no density
    precondition: a running max is associative, so bucket summaries
    compose losslessly.
    """
    b = df.withColumn("__b", bucket)
    within_w = (
        Window.partitionBy(key, "__b")
        .orderBy(ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = b.withColumn("__run", F.max(value).over(within_w))
    bmax = b.groupBy(key, "__b").agg(F.max(value).alias("__bmax"))
    prior_w = (
        Window.partitionBy(key)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = bmax.withColumn("__prior", F.max("__bmax").over(prior_w)).select(
        key, "__b", "__prior"
    )
    joined = within.join(prior, [key, "__b"])
    peak = F.greatest(F.col("__run"), F.coalesce(F.col("__prior"), F.col("__run")))
    dd = F.when(peak != 0, (peak - F.col(value)) / peak).otherwise(F.lit(0.0))
    return (
        joined.select(F.col(key), dd.alias("dd"), F.col(value).alias("v"))
        .groupBy(key)
        .agg(
            F.max("dd").alias("max_drawdown"),
            F.max("v").alias("peak_value"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def prefix_sum_chunked(
    df: DataFrame,
    ts: str,
    value: str,
    bucket: Column,
    *tiebreak: str,
) -> DataFrame:
    """Globally-ordered running sum without a global window: within-bucket
    cumulative sums (window partitioned by the bucket — parallel) plus an
    exclusive prefix over the tiny per-bucket totals frame, broadcast
    back.  Exact for any associative sum; the only unpartitioned window
    touches one row per bucket (days/hours), which does not grow with
    row count — the shape that keeps a cumulative metric feasible on a
    year of 100 TB events (a bare ``Window.orderBy(ts)`` drags the whole
    stream through one task).

    Returns the input columns plus ``__cum`` (running sum including the
    current row, ordered by (ts, *tiebreak) globally).

    PRECONDITIONS (violations produce wrong sums, so they are guarded):

    1. ``bucket`` must be a NON-DECREASING function of the ``(ts,
       *tiebreak)`` sort order — the exclusive bucket prefix assumes
       every row of bucket b sorts before every row of bucket b+1.
       Calendar truncations of ``ts`` (day/hour/month) satisfy this;
       a bucket derived from anything other than a monotone transform
       of the sort key does NOT, and the result would interleave
       buckets while the offsets assume they are contiguous.  Guarded
       structurally: callers pass truncations of ``ts`` (q146/q179/
       q209); the property suite pins equality with the single-window
       form on every caller shape.
    2. ``bucket`` must be non-NULL for every row: the inner equi-join
       on ``__b`` drops NULL-bucket rows silently (NULL never equals
       NULL in a join), and a NULL bucket has no position in the
       prefix order anyway.  Guarded at runtime below — a NULL bucket
       raises instead of returning partial sums.
    """
    b = df.withColumn(
        "__b",
        F.when(
            bucket.isNull(),
            F.raise_error(
                F.lit(
                    "prefix_sum_chunked: bucket expression evaluated to NULL"
                    " — NULL buckets would be silently dropped by the offset"
                    " join; filter or coalesce them before calling"
                )
            ),
        ).otherwise(bucket),
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(ts, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = b.withColumn("__local", F.sum(value).over(w_in))
    btot = b.groupBy("__b").agg(F.sum(value).alias("__btot"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "__b", F.coalesce(F.sum("__btot").over(w_b), F.lit(0)).alias("__off")
    )
    return (
        within.join(F.broadcast(offs), "__b")
        .withColumn("__cum", F.col("__local") + F.col("__off"))
        .drop("__b", "__local", "__off")
    )
