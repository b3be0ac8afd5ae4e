"""Technical indicators over the tick stream, learned clustering + SemDeDup, TPC-H decorrelation shapes (q87-q122).

Split from the single-module registry in round 7 (the 18.6k-line file
was a standing mechanical-edit hazard — see STATUS r6 lessons).  The
driver contract is unchanged: ``stock_ops_spark.queries`` re-exports
``QUERIES``/``ORACLES`` and every query function; registration order is
preserved by ``__init__``'s import order.  Conventions: see
``stock_ops_spark/queries/_base.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from stock_ops_spark import catalog  # noqa: F401
from stock_ops_spark.functions import text as TXT  # noqa: F401
from stock_ops_spark.functions import vector as V  # noqa: F401
from stock_ops_spark.operators.asof import asof_join_nearest  # noqa: F401
from stock_ops_spark.operators.multimodal import (  # noqa: F401
    media_from_text,
    metadata_only_stats,
)
from stock_ops_spark.operators.ohlc import session_ohlc  # noqa: F401
from stock_ops_spark.operators.similarity import ivf_topk, knn_join  # noqa: F401
from stock_ops_spark.operators.versioning import latest_version_view  # noqa: F401

from stock_ops_spark.queries._base import (  # noqa: F401
    _neardup_pairs,
    _register,
    _rev4,
    _t,
)



# ---------------------------------------------------------------------------
# Technical indicators over the tick stream (domain extension; operators/
# timeseries.py) and training-data quality ops (decontamination, repetition)
# ---------------------------------------------------------------------------


@_register(
    "q87_bollinger_breaches",
    """
    WITH t AS (
      SELECT user_id, event_id, value,
             avg(value)         OVER w AS mid,
             stddev_samp(value) OVER w AS sd,
             count(*)           OVER w AS n_in_frame
      FROM events
      WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           round(value, 2)                 AS value,
           round(mid, 6)                   AS bb_mid,
           round(mid + 2 * sd, 6)          AS bb_upper,
           round(mid - 2 * sd, 6)          AS bb_lower,
           CAST(CASE WHEN value > round(mid + 2 * sd, 6) THEN 1
                     WHEN value < round(mid - 2 * sd, 6) THEN -1
                     ELSE 0 END AS BIGINT) AS breach,
           CAST(n_in_frame AS BIGINT)      AS n_in_frame
    FROM t
    """,
)
def q87_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (8-tick rolling mean +- 2 sigma) per instrument key
    over the purchase tick stream, with a band-breach signal.  One
    exchange on the key; all four outputs share a single window sort
    (operators/timeseries.py:bollinger).  The breach compares against the
    ROUNDED band so the signal is decimal-stable across engines."""
    from stock_ops_spark.operators.timeseries import bollinger

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    b = bollinger(ev, "user_id", "ts", "value", "event_id", n=8, width=2.0)
    up = F.round("bb_upper", 6)
    lo = F.round("bb_lower", 6)
    return b.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round("bb_mid", 6).alias("bb_mid"),
        up.alias("bb_upper"),
        lo.alias("bb_lower"),
        F.when(F.col("value") > up, F.lit(1))
        .when(F.col("value") < lo, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("breach"),
        F.col("n_in_frame").cast("bigint").alias("n_in_frame"),
    )


@_register(
    "q88_max_drawdown",
    """
    WITH t AS (
      SELECT user_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM events
      WHERE event_type = 'purchase'
    )
    SELECT user_id,
           round(max(CASE WHEN peak <> 0 THEN (peak - value) / peak
                          ELSE 0 END), 6)       AS max_drawdown,
           round(max(value), 2)                 AS peak_value,
           CAST(count(*) AS BIGINT)             AS n_ticks
    FROM t
    GROUP BY user_id
    """,
)
def q88_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per instrument: running-peak window (rank scan,
    no self-join) + per-key aggregate, both on the same hash partition —
    one exchange total (operators/timeseries.py:max_drawdown)."""
    from stock_ops_spark.operators.timeseries import max_drawdown

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return max_drawdown(ev, "user_id", "ts", "value", "event_id").select(
        "user_id",
        F.round("max_drawdown", 6).alias("max_drawdown"),
        F.round("peak_value", 2).alias("peak_value"),
        F.col("n_ticks").cast("bigint").alias("n_ticks"),
    )


@_register(
    "q89_rsi_momentum",
    """
    WITH c AS (
      SELECT user_id, event_id, ts, value,
             value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS chg
      FROM events
      WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, event_id,
             avg(greatest(chg, 0))  OVER w AS gain,
             avg(greatest(-chg, 0)) OVER w AS loss,
             count(chg)             OVER w AS n_changes
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           round(CASE WHEN gain = 0 AND loss = 0 THEN NULL
                      WHEN loss = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + gain / loss) END, 6) AS rsi
    FROM r
    WHERE n_changes = 7
    """,
)
def q89_rsi_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-change simple RSI (Cutler form: SMA of gains vs losses — exact
    and window-stable, unlike Wilder's recursive smoothing which is a
    sequential per-key scan).  Only fully-warmed frames are emitted
    (operators/timeseries.py:rsi)."""
    from stock_ops_spark.operators.timeseries import rsi

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    r = rsi(ev, "user_id", "ts", "value", "event_id", n=7)
    return r.where(F.col("n_changes") == 7).select(
        "user_id", "event_id", F.round("rsi", 6).alias("rsi")
    )


@_register(
    "q90_ewma_price",
    """
    WITH t AS (
      SELECT user_id, event_id, value,
             lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
             lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
             lag(value, 5) OVER w AS l5, lag(value, 6) OVER w AS l6,
             lag(value, 7) OVER w AS l7, lag(value, 8) OVER w AS l8
      FROM events
      WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           round((0.0 + value * 1.0
                      + coalesce(l1 * 0.5, 0) + coalesce(l2 * 0.25, 0)
                      + coalesce(l3 * 0.125, 0) + coalesce(l4 * 0.0625, 0)
                      + coalesce(l5 * 0.03125, 0) + coalesce(l6 * 0.015625, 0)
                      + coalesce(l7 * 0.0078125, 0) + coalesce(l8 * 0.00390625, 0))
                 / (0.0 + 1.0
                      + CASE WHEN l1 IS NOT NULL THEN 0.5 ELSE 0 END
                      + CASE WHEN l2 IS NOT NULL THEN 0.25 ELSE 0 END
                      + CASE WHEN l3 IS NOT NULL THEN 0.125 ELSE 0 END
                      + CASE WHEN l4 IS NOT NULL THEN 0.0625 ELSE 0 END
                      + CASE WHEN l5 IS NOT NULL THEN 0.03125 ELSE 0 END
                      + CASE WHEN l6 IS NOT NULL THEN 0.015625 ELSE 0 END
                      + CASE WHEN l7 IS NOT NULL THEN 0.0078125 ELSE 0 END
                      + CASE WHEN l8 IS NOT NULL THEN 0.00390625 ELSE 0 END), 6)
             AS ewma
    FROM t
    """,
)
def q90_ewma_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lag EWMA (alpha = 0.5, 8 lags) per instrument.  alpha 1/2
    makes every weight a negative power of two — exactly representable,
    so Spark and the oracle agree bit-for-bit; the normalizer adapts at
    partition heads.  Pure codegen lag expressions, one window sort
    (operators/timeseries.py:ewma_bounded)."""
    from stock_ops_spark.operators.timeseries import ewma_bounded

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    e = ewma_bounded(ev, "user_id", "ts", "value", "event_id", alpha=0.5, n_lags=8)
    return e.select("user_id", "event_id", F.round("ewma", 6).alias("ewma"))


@_register(
    "q91_vwap_per_part",
    """
    SELECT l_partkey,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS vwap,
           round(sum(l_quantity), 2)                                     AS total_qty,
           CAST(count(*) AS BIGINT)                                      AS n_trades
    FROM lineitem
    GROUP BY l_partkey
    """,
)
def q91_vwap_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch VWAP per part (price x quantity weighted) — the at-rest twin
    of the streaming running-VWAP state op (streaming/stateful.py).  One
    hash aggregate with map-side partial sums
    (operators/timeseries.py:vwap)."""
    from stock_ops_spark.operators.timeseries import vwap

    li = _t(spark, sf_dir, "lineitem")
    v = vwap(li, ["l_partkey"], "l_extendedprice", "l_quantity")
    return v.select(
        "l_partkey",
        F.round("vwap", 6).alias("vwap"),
        F.round("total_qty", 2).alias("total_qty"),
        F.col("n_trades").cast("bigint").alias("n_trades"),
    )


@_register(
    "q92_quality_rules",
    """
    WITH d AS (
      SELECT source,
             string_split(text, ' ')                          AS w,
             length(replace(text, ' ', ''))                   AS n_letters
      FROM documents
    ),
    m AS (
      SELECT source,
             n_letters * 1.0 / len(w)                                  AS mean_wlen,
             len(list_filter(w, x -> x IN ('a', 'the'))) * 1.0 / len(w) AS stop_frac,
             1.0 - len(list_distinct(w)) * 1.0 / len(w)                 AS dup_frac
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                                   AS n_docs,
           CAST(sum(CASE WHEN mean_wlen > 4.8 THEN 1 ELSE 0 END) AS BIGINT)
                                                                      AS n_fail_wlen,
           CAST(sum(CASE WHEN stop_frac > 0.12 THEN 1 ELSE 0 END) AS BIGINT)
                                                                      AS n_fail_stop,
           CAST(sum(CASE WHEN dup_frac > 0.6 THEN 1 ELSE 0 END) AS BIGINT)
                                                                      AS n_fail_dup,
           CAST(sum(CASE WHEN mean_wlen <= 4.8 AND stop_frac <= 0.12
                          AND dup_frac <= 0.6 THEN 1 ELSE 0 END) AS BIGINT)
                                                                      AS n_clean,
           round(avg(mean_wlen), 6)                                   AS avg_mean_wlen,
           round(avg(dup_frac), 6)                                    AS avg_dup_frac
    FROM m
    GROUP BY source
    """,
)
def q92_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gates per source: mean word length,
    stopword fraction, duplicate-word fraction — every signal an integer
    ratio (exact across engines), every rule a map-side expression; one
    aggregate shuffle on source.  The production use is corpus triage
    before training-data selection."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    nw = F.size(w)
    mean_wlen = F.length(F.regexp_replace("text", " ", "")) * 1.0 / nw
    stop_frac = (
        F.size(F.filter(w, lambda x: x.isin("a", "the"))) * 1.0 / nw
    )
    dup_frac = 1.0 - F.size(F.array_distinct(w)) * 1.0 / nw
    m = d.select(
        "source",
        mean_wlen.alias("mean_wlen"),
        stop_frac.alias("stop_frac"),
        dup_frac.alias("dup_frac"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("mean_wlen") > 4.8).cast("int")).cast("bigint").alias("n_fail_wlen"),
        F.sum((F.col("stop_frac") > 0.12).cast("int")).cast("bigint").alias("n_fail_stop"),
        F.sum((F.col("dup_frac") > 0.6).cast("int")).cast("bigint").alias("n_fail_dup"),
        F.sum(
            (
                (F.col("mean_wlen") <= 4.8)
                & (F.col("stop_frac") <= 0.12)
                & (F.col("dup_frac") <= 0.6)
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_clean"),
        F.round(F.avg("mean_wlen"), 6).alias("avg_mean_wlen"),
        F.round(F.avg("dup_frac"), 6).alias("avg_dup_frac"),
    )


@_register(
    "q93_decontamination",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(w) - 3 + 1),
               i -> array_to_string(list_slice(w, i, i + 3), ' ')))) AS gram
      FROM d
      WHERE len(w) >= 4
    ),
    b AS (SELECT DISTINCT gram, doc_id AS bench_id FROM g WHERE doc_id % 23 = 0)
    SELECT t.doc_id,
           CAST(count(DISTINCT t.gram) AS BIGINT)     AS n_shared_grams,
           CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
    FROM g t JOIN b ON t.gram = b.gram
    WHERE t.doc_id % 23 <> 0
    GROUP BY t.doc_id
    """,
)
def q93_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 4-gram with the held-out benchmark slice (doc_id % 23 = 0) — the
    n-gram-overlap scrub every serious LLM corpus runs against eval sets.

    Scale shape: the benchmark side is small by construction, so its
    distinct (gram, doc) set BROADCASTS; the training side never
    shuffles its exploded grams — map-side hash probe, then one aggregate
    on the surviving (contaminated) sliver only.

    PERF (r8): split(text, ' ') is projected as its own column BEFORE
    the gram transform — inlined it lands inside the lambda and
    re-splits the WHOLE text once per gram (O(words²) per doc, the
    char_ngrams/q264 defect).  The staged attribute is multi-referenced
    so Catalyst keeps it: split runs once per row.  Measured at sf1:
    14.4 s → 10.7 s (1.35×)."""
    d = _t(spark, sf_dir, "documents")
    grams = F.array_distinct(
        F.expr(
            "CASE WHEN size(__w) >= 4 THEN "
            "transform(sequence(1, size(__w) - 3), "
            "i -> array_join(slice(__w, i, 4), ' ')) "
            "ELSE array() END"
        )
    )
    g = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("__w")
    ).select("doc_id", F.explode(grams).alias("gram"))
    bench = (
        g.where(F.col("doc_id") % 23 == 0)
        .select("gram", F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    train = g.where(F.col("doc_id") % 23 != 0)
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("bigint").alias("n_shared_grams"),
            F.countDistinct("bench_id").cast("bigint").alias("n_bench_docs"),
        )
    )


@_register(
    "q94_repetition_stats",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM d
      WHERE len(w) >= 2
    ),
    cnt AS (
      SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)                    AS total_bigrams,
           CAST(count(*) AS BIGINT)                  AS distinct_bigrams,
           CAST(max(c) AS BIGINT)                    AS max_repeat,
           round(max(c) * 1.0 / sum(c), 6)           AS top_frac,
           round(1.0 - count(*) * 1.0 / sum(c), 6)   AS dup_frac
    FROM cnt
    GROUP BY doc_id
    """,
)
def q94_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile over word bigrams (total /
    distinct / hottest bigram) — the repeated-n-gram quality signal used
    to score degenerate or boilerplate text.

    SHUFFLE-FREE: the hottest-bigram count is a run-length scan over the
    doc's SORTED bigram array (aggregate HOF), so the whole profile is a
    per-row projection — no explode, no groupBy, nothing leaves the map
    side.  (The explode + two-aggregate form this replaced moved ~1.5M
    grams through two exchanges at sf0.1 for the same integers.)"""
    d = _t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat(element_at(split(text, ' '), i), ' ', "
        "element_at(split(text, ' '), i + 1))) "
        "ELSE array() END"
    )
    # eligibility filter on the RAW text before any array is built: a
    # filter on a derived column would be pushed beneath the projection
    # with the whole bigram pipeline substituted in — evaluating it twice
    # (measured 0.15s -> 2.6s at sf0.1)
    d = d.where(F.size(F.split(F.col("text"), " ")) >= 2)
    # stage the sorted array once (HOF lambdas re-evaluate inline exprs)
    staged = d.select("doc_id", F.array_sort(bigrams).alias("bg"))
    max_run = F.expr(
        "CASE WHEN size(bg) >= 2 THEN "
        "aggregate(sequence(2, size(bg)), "
        "named_struct('mx', 1, 'cur', 1), "
        "(acc, i) -> IF(element_at(bg, i) = element_at(bg, i - 1), "
        "named_struct('mx', greatest(acc.mx, acc.cur + 1), 'cur', acc.cur + 1), "
        "named_struct('mx', acc.mx, 'cur', 1)), "
        "acc -> acc.mx) "
        "ELSE least(size(bg), 1) END"
    )
    # project each scalar ONCE — the ratio columns below must reference
    # these, not repeat the expressions (a repeated HOF re-runs the scan)
    scalars = staged.select(
        "doc_id",
        F.size("bg").cast("bigint").alias("total_bigrams"),
        F.size(F.array_distinct("bg")).cast("bigint").alias("distinct_bigrams"),
        max_run.cast("bigint").alias("max_repeat"),
    )
    return scalars.select(
        "doc_id",
        "total_bigrams",
        "distinct_bigrams",
        "max_repeat",
        F.round(F.col("max_repeat") * 1.0 / F.col("total_bigrams"), 6).alias("top_frac"),
        F.round(1.0 - F.col("distinct_bigrams") * 1.0 / F.col("total_bigrams"), 6).alias(
            "dup_frac"
        ),
    )


@_register(
    "q95_streaming_dedup",
    """
    SELECT event_id, user_id, event_type
    FROM events
    """,
)
def q95_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup with bounded state: the events table is
    replayed TWICE (two files in one source directory), and
    ``dropDuplicatesWithinWatermark`` collapses re-deliveries while the
    watermark bounds how long each key is remembered — the
    effectively-once guard a reconnecting feed needs (reference replays
    the same wss frames after reconnect —
    `src/stockops/data/streaming/eodhd_streaming_service.py:206-266`).

    availableNow drains both copies; state is keyed by event_id only
    (watermark evicts keys older than the delay, so state is O(window),
    not O(stream)).  The duplicate rows are byte-identical, so which
    survives is immaterial — the oracle is the plain table."""
    import os
    import shutil
    import tempfile
    import uuid

    from stock_ops_spark.catalog import stream_table, table_path

    name = f"sdedup_{uuid.uuid4().hex[:8]}"
    stream_dir = tempfile.mkdtemp(prefix="events_dedup_")
    ckpt_dir = tempfile.mkdtemp(prefix="dedup_ckpt_")
    src = table_path(sf_dir, "events")
    os.symlink(src, os.path.join(stream_dir, "events_a.parquet"))
    os.symlink(src, os.path.join(stream_dir, "events_b.parquet"))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = (
            stream_table(spark, sf_dir, "events", stream_dir)
            .withColumn("ets", F.col("ts"))
            .withWatermark("ets", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "user_id", "event_type")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return spark.table(name).select("event_id", "user_id", "event_type")


@_register(
    "q96_sequence_packing",
    """
    WITH RECURSIVE d AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk AS (
      SELECT source, doc_id, n_tokens, rn,
             0 AS bin_id, n_tokens AS cum
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN w.cum + d.n_tokens <= 512 THEN w.bin_id ELSE w.bin_id + 1 END,
             CASE WHEN w.cum + d.n_tokens <= 512 THEN w.cum + d.n_tokens ELSE d.n_tokens END
      FROM d JOIN walk w ON d.source = w.source AND d.rn = w.rn + 1
    )
    SELECT source, doc_id,
           CAST(n_tokens AS BIGINT)      AS n_tokens,
           CAST(bin_id AS BIGINT)        AS bin_id,
           CAST(cum - n_tokens AS BIGINT) AS offset
    FROM walk
    """,
)
def q96_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context-window packing of each source shard's documents
    into 512-token bins (operators/packing.py) — the training-batch
    construction pass.  Sequential within a shard by definition, so the
    operator is `applyInPandas` per shard: one exchange on source, a
    numpy loop per Arrow batch.  The oracle replays the identical greedy
    walk as a recursive CTE."""
    from stock_ops_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    out = pack_sequences(d, "source", "doc_id", "n_tokens", capacity=512)
    return out.select(
        "source",
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("bin_id").cast("bigint").alias("bin_id"),
        F.col("offset").cast("bigint").alias("offset"),
    )


@_register(
    "q97_stream_static_enrichment",
    """
    SELECT c.c_mktsegment              AS segment,
           e.event_type,
           CAST(count(*) AS BIGINT)    AS n_events,
           round(sum(e.value), 2)      AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def q97_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream is joined IN FLIGHT to
    the static customer dimension (broadcast to every task — no state, no
    watermark needed for stream-static inner joins), then aggregated at
    rest.  This is the canonical streaming enrichment topology: dimension
    tables broadcast, fact stream never shuffles before the join.
    availableNow drains the replay in one batch, so the result equals the
    batch join — full SQL oracle."""
    import shutil
    import tempfile
    import uuid
    import os

    from stock_ops_spark.catalog import stream_table, table_path

    name = f"senrich_{uuid.uuid4().hex[:8]}"
    stream_dir = tempfile.mkdtemp(prefix="events_enrich_")
    ckpt_dir = tempfile.mkdtemp(prefix="enrich_ckpt_")
    os.symlink(table_path(sf_dir, "events"), os.path.join(stream_dir, "events.parquet"))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        cust = _t(spark, sf_dir, "customer").select(
            F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
        )
        stream = (
            stream_table(spark, sf_dir, "events", stream_dir)
            .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
            .select("segment", "event_type", "value")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@_register(
    "q98_cogroup_asof",
    """
    WITH p AS (
      SELECT user_id, ts, max(value) AS pval
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT s.event_id,
           s.user_id,
           round((SELECT p.pval FROM p
                  WHERE p.user_id = s.user_id
                  ORDER BY abs(epoch_us(p.ts) - epoch_us(s.ts)), p.ts
                  LIMIT 1), 6) AS nearest_purchase_value
    FROM events s
    WHERE s.event_type = 'signup'
    """,
)
def q98_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q14 as-of join through the COGROUPED-pandas path
    (operators/asof.py:asof_cogroup_nearest): both sides co-partitioned
    on hash-buckets of user_id, each bucket's Arrow batch pair merged
    with a group-aware vectorized merge_asof — the Python boundary is
    crossed per bucket, not per key.  Same semantics, same oracle — this
    entry exists to keep the per-group-imperative escape hatch (validity
    windows, per-key tolerances) exercised end-to-end against the window
    form."""
    from stock_ops_spark.operators.asof import asof_cogroup_nearest

    ev = _t(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    out = asof_cogroup_nearest(
        signups, purchases, on="ts", by=["user_id"], right_value_col="pval"
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("nearest_value", 6).alias("nearest_purchase_value"),
    )


@_register(
    "q99_session_windows_native",
    """
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM g
    )
    SELECT user_id,
           CAST(min(epoch_us(ts)) AS BIGINT)                AS session_start_us,
           CAST(max(epoch_us(ts)) + 1800000000 AS BIGINT)   AS session_end_us,
           CAST(count(*) AS BIGINT)                         AS n_events,
           round(sum(value), 2)                             AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q99_session_windows_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's NATIVE session_window operator
    (dynamic gap merging inside the aggregate — the same operator the
    streaming engine uses for event-time sessions), vs q33's explicit
    lag/cumsum islands.  Empirically pinned boundary: a gap of exactly
    the 30-minute duration MERGES (split is strictly greater), and the
    window end is last event + gap; the oracle replays that convention
    in integer microseconds."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


@_register(
    "q100_filtered_ann",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label, d.source,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos_sim
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id, q
    WHERE e.vec_id <> 0
      AND e.label % 2 = 0
      AND d.lang = 'en'
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT 10
    """,
)
def q100_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered (hybrid) vector search: structured predicates — an
    embedding-side label filter AND a document-metadata filter — applied
    BEFORE any distance math, then exact cosine top-k on the surviving
    sliver.  This is the production hybrid-search shape: predicates
    prune partitions/row-groups at the scan (filter-then-rank, never
    rank-then-filter), the doc-metadata join carries only (doc_id, lang,
    source), and the final k is TakeOrderedAndProject — no global sort."""
    e = _t(spark, sf_dir, "embeddings")
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sim = V.cosine(F.col("embedding"), F.col("qv"))
    return (
        e.where((F.col("vec_id") != 0) & (F.col("label") % 2 == 0))
        .join(d.where(F.col("lang") == "en"), F.col("doc_id") == F.col("vec_id"))
        .join(F.broadcast(qv))
        .select("vec_id", "label", "source", sim.alias("__sim"))
        .orderBy(F.col("__sim").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "source", F.round("__sim", 6).alias("cos_sim"))
    )


@_register(
    "q101_retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort_day,
             CAST(CAST(e.ts AS DATE) - f.cohort_day AS BIGINT) // 7 AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d')  AS cohort_day,
           CAST(week_offset AS BIGINT)        AS week_offset,
           CAST(count(*) AS BIGINT)           AS n_users
    FROM activity
    GROUP BY cohort_day, week_offset
    """,
)
def q101_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted
    in each subsequent activity week (integer day-arithmetic offsets —
    no engine week-boundary conventions involved).  Two aggregates on
    user_id share one exchange; the cohort map joins back broadcast-size.
    The classic growth-analytics rollup, here as the engine's cohort
    operator."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    act = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(F.datediff(F.col("d"), F.col("cohort_day")) / 7).alias(
                "week_offset"
            ),
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "n_users",
    )


@_register(
    "q102_session_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER w AS next_type,
             lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type              AS from_type,
           next_type               AS to_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM seq
    WHERE next_type IS NOT NULL AND gap_us <= 1800000000
    GROUP BY event_type, next_type
    """,
)
def q102_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence transition counts (the Markov/path-analysis shape):
    per-user ordered lead() pairs, kept when the step stays inside a
    30-minute session gap (exact integer-microsecond comparison), counted
    globally.  One window exchange on user_id + one small aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("to_type"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("gap_us"),
    )
    return (
        seq.where(F.col("to_type").isNotNull() & (F.col("gap_us") <= 1800000000))
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )


@_register(
    "q103_part_revenue_share",
    """
    WITH pr AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(rev) AS total FROM pr)
    SELECT pr.l_partkey,
           round(pr.rev, 4)                       AS revenue,
           round(pr.rev / tot.total, 9)           AS share
    FROM pr, tot
    WHERE pr.rev > tot.total * 0.0008
    """,
)
def q103_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key revenue filtered against a GLOBAL scalar
    threshold.  The total is a one-row aggregate joined in broadcast —
    the per-part aggregate is computed once and reused for both the
    share numerator and the filter (no second scan)."""
    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    tot = pr.agg(F.sum("rev").alias("total"))
    return (
        pr.join(F.broadcast(tot))
        .where(F.col("rev") > F.col("total") * 0.0008)
        .select(
            "l_partkey",
            F.round("rev", 4).alias("revenue"),
            F.round(F.col("rev") / F.col("total"), 9).alias("share"),
        )
    )


@_register(
    "q104_top_suppliers",
    """
    WITH sr AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, sr.rev AS total_revenue
    FROM supplier s JOIN sr ON s.s_suppkey = sr.l_suppkey
    WHERE sr.rev = (SELECT max(rev) FROM sr)
    """,
)
def q104_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly supplier revenue, keep the argmax
    suppliers (ties preserved).  The revenue 'view' is aggregated once;
    the scalar max joins back broadcast.  Revenue is rounded BEFORE the
    equality so the max-match is decimal-stable across engines."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sr = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("rev")
        )
    )
    mx = sr.agg(F.max("rev").alias("mx"))
    return (
        sr.join(F.broadcast(mx))
        .where(F.col("rev") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev").alias("total_revenue"))
    )


@_register(
    "q105_realized_volatility",
    """
    WITH r AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             ln(value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS lr
      FROM events
      WHERE event_type = 'purchase' AND value > 0
    )
    SELECT user_id,
           strftime(d, '%Y-%m-%d')          AS day,
           CAST(count(lr) AS BIGINT)        AS n_returns,
           round(sum(lr * lr), 6)           AS realized_var
    FROM r
    WHERE lr IS NOT NULL
    GROUP BY user_id, d
    """,
)
def q105_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily realized variance per instrument: sum of squared log tick
    returns — the standard realized-volatility estimator.  The return
    series is the same single-exchange window pass as every indicator
    (operators/timeseries.py family); the daily rollup reuses the
    user_id partition.  Zero-priced ticks are excluded up front: a 0
    denominator is an ANSI arithmetic error on Spark but a silent NULL on
    the oracle — the filter keeps both engines in the defined domain."""
    ev = _t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.log(F.col("value") / F.lag("value").over(w)).alias("lr"),
    )
    return (
        r.where(F.col("lr").isNotNull())
        .groupBy("user_id", "d")
        .agg(
            F.count("lr").cast("bigint").alias("n_returns"),
            F.round(F.sum(F.col("lr") * F.col("lr")), 6).alias("realized_var"),
        )
        .select(
            "user_id",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_returns",
            "realized_var",
        )
    )


@_register(
    "q106_pagerank_copurchase",
    """
    WITH el AS (
      SELECT DISTINCT 'c' || o.o_custkey AS s, 's' || l.l_suppkey AS d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    e AS (SELECT s, d FROM el UNION SELECT d AS s, s AS d FROM el),
    deg AS (SELECT s, count(*) AS deg FROM e GROUP BY s),
    n AS (SELECT s AS node FROM e UNION SELECT d AS node FROM e),
    r0 AS (SELECT node, 1.0 AS rank FROM n),
    i1 AS (SELECT e.d AS node, sum(r0.rank / deg.deg) AS inflow
           FROM r0 JOIN e ON r0.node = e.s JOIN deg ON e.s = deg.s GROUP BY e.d),
    r1 AS (SELECT n.node, 0.15 + 0.85 * coalesce(i1.inflow, 0) AS rank
           FROM n LEFT JOIN i1 ON n.node = i1.node),
    i2 AS (SELECT e.d AS node, sum(r1.rank / deg.deg) AS inflow
           FROM r1 JOIN e ON r1.node = e.s JOIN deg ON e.s = deg.s GROUP BY e.d),
    r2 AS (SELECT n.node, 0.15 + 0.85 * coalesce(i2.inflow, 0) AS rank
           FROM n LEFT JOIN i2 ON n.node = i2.node),
    i3 AS (SELECT e.d AS node, sum(r2.rank / deg.deg) AS inflow
           FROM r2 JOIN e ON r2.node = e.s JOIN deg ON e.s = deg.s GROUP BY e.d),
    r3 AS (SELECT n.node, 0.15 + 0.85 * coalesce(i3.inflow, 0) AS rank
           FROM n LEFT JOIN i3 ON n.node = i3.node)
    SELECT node, round(rank, 6) AS rank
    FROM r3
    ORDER BY round(rank, 6) DESC, node
    LIMIT 50
    """,
)
def q106_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the bidirected customer↔supplier
    co-purchase graph (operators/graph.py:pagerank): two exchanges per
    round, ranks localCheckpointed to sever lineage — the iterative-
    algorithm template next to connected components.  The oracle unrolls
    the identical power iteration; the top-k cut orders by the ROUNDED
    rank so the boundary is decimal-stable."""
    from stock_ops_spark.operators.graph import pagerank_cached

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # integer node encoding (customers even, suppliers odd): the three
    # power iterations shuffle narrow longs, not concat'd strings; the
    # display label is reconstructed only on the final 50 rows
    el = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("s"),
            (F.col("l_suppkey") * 2 + 1).alias("d"),
        )
        .distinct()
    )
    bi = el.union(el.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # one-fit-many-readers: the converged rank frame is the registry's most
    # expensive pipeline — materialize once per source snapshot (v-tagged
    # cache key over both input files), then every call is a parquet read
    ranks = pagerank_cached(
        bi,
        [
            catalog.table_path(sf_dir, "orders"),
            catalog.table_path(sf_dir, "lineitem"),
        ],
        variant="q106_copurchase_bidirected",
        iters=3,
        broadcast_ranks=True,
    )
    label = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("c"), F.expr("node DIV 2"))
    ).otherwise(F.concat(F.lit("s"), F.expr("node DIV 2")))
    r = F.round("rank", 6)
    return (
        ranks.select(label.alias("node"), r.alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(50)
    )


@_register(
    "q107_zscore_outliers",
    """
    WITH s AS (
      SELECT event_type,
             avg(value)         AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 2)                    AS value,
           round((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE s.sigma > 0 AND abs(round((e.value - s.mu) / s.sigma, 6)) > 3.0
    """,
)
def q107_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly detection: one aggregate pass for the
    moments (broadcast back — five rows), one codegen'd scan for the
    outliers; the cut compares the ROUNDED z so the 3σ boundary is
    decimal-stable across engines."""
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (
        ev.join(F.broadcast(s), "event_type")
        .where((F.col("sigma") > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            z.alias("zscore"),
        )
    )


@_register(
    "q108_cluster_canonicalization",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
                                          i -> substr(lower(text), i, 8))) AS s
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
            / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS src, doc_id AS dst FROM documents
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s
    ),
    comp AS (
      SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    ),
    ranked AS (
      SELECT c.component, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component) AS sz
      FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT component,
           doc_id                     AS kept_doc,
           CAST(n_chars AS BIGINT)    AS kept_chars,
           CAST(sz - 1 AS BIGINT)     AS n_dropped
    FROM ranked
    WHERE rn = 1 AND sz > 1
    """,
)
def q108_cluster_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END-STATE: near-dup pairs (q21 pipeline) → connected
    components (q70) → per-cluster CANONICAL SELECTION — keep the
    longest document (doc_id tiebreak), count what gets dropped.  This
    is the row a production dedup job actually writes before deleting
    data; the ranked window rides the component partition, so
    canonicalization adds ONE exchange after clustering."""
    from stock_ops_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs, nodes=d.select("doc_id")).select(
        F.col("node").alias("doc_id"), "component"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = (
        comp.join(d.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("component")))
    )
    return (
        ranked.where((F.col("rn") == 1) & (F.col("sz") > 1))
        .select(
            "component",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_chars").cast("bigint").alias("kept_chars"),
            (F.col("sz") - 1).cast("bigint").alias("n_dropped"),
        )
    )


@_register(
    "q109_resample_ffill",
    """
    WITH days AS (
      SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                    INTERVAL 1 DAY))::DATE AS d
    ),
    ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    daily AS (SELECT user_id, d, value AS close FROM ranked WHERE rn = 1),
    grid AS (
      SELECT u.user_id, days.d
      FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN days
    )
    SELECT g.user_id,
           strftime(g.d, '%Y-%m-%d')  AS day,
           round(last_value(daily.close IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.d), 2) AS close,
           CAST(CASE WHEN daily.close IS NULL THEN 1 ELSE 0 END AS BIGINT)
                                      AS gap_filled
    FROM grid g
    LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
    """,
)
def q109_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar resample + forward fill (pandas ``asfreq('D').ffill()``
    distributed): per instrument, every calendar day gets the last known
    close, with gap provenance.  The day spine is generated (sequence +
    explode) and BROADCAST onto the distinct-key set — never a shuffle
    of the fact table for the grid; the carry is the same
    last-ignorenulls window as the as-of join (operators/asof.py), one
    exchange on the instrument key."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    rn_w = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.select("user_id", F.to_date("ts").alias("d"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(rn_w))
        .where(F.col("rn") == 1)
        .select("user_id", "d", F.col("value").alias("close"))
    )
    days = spark.range(0, 1, 1, 1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    grid = daily.select("user_id").distinct().crossJoin(F.broadcast(days))
    carry = Window.partitionBy("user_id").orderBy("d")
    out = grid.join(daily, ["user_id", "d"], "left")
    return out.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(F.last("close", ignorenulls=True).over(carry), 2).alias("close"),
        F.when(F.col("close").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("gap_filled"),
    )


@_register(
    "q110_variant_props",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT)                                  AS n_rows,
           CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT)   AS sum_k,
           CAST(max(json_extract(props, '$.k')::BIGINT) AS BIGINT)   AS max_k,
           CAST(count(DISTINCT json_extract(props, '$.k')::BIGINT) AS BIGINT)
                                                                     AS distinct_k
    FROM events GROUP BY event_type
    """,
)
def q110_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: the props
    JSON is parsed ONCE into the binary variant encoding, then every
    field access is a cheap shredded lookup (variant_get) — the scale
    answer to N× get_json_object re-parses (q35 is the string-path
    twin).  At rest a variant column also shreds into parquet columns,
    so these extractions become plain columnar reads."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.countDistinct("k").cast("bigint").alias("distinct_k"),
        )
    )


@_register(
    "q111_udtf_chunks",
    """
    WITH d AS (SELECT doc_id, length(text) AS n FROM documents),
    idx AS (
      SELECT d.doc_id, d.n,
             unnest(range(0, CAST(ceil(n / 100.0) AS BIGINT))) AS chunk_idx
      FROM d
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT)                    AS chunk_idx,
           CAST(least(100, n - chunk_idx * 100) AS BIGINT) AS chunk_len
    FROM idx
    """,
)
def q111_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking through a PYTHON UDTF (Spark 4 user-defined
    table function, Arrow-batched): one input row lateral-joins to N
    chunk rows — the registry-surface twin of the pure-SQL chunker
    (q60).  UDTFs are the escape hatch for 1→N transforms whose logic
    outgrows sequence()/explode(); this one is deliberately simple so
    the oracle can replay it arithmetically."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_len bigint")
    class ChunkText:
        def eval(self, text: str):
            n = len(text)
            idx = 0
            while idx * 100 < n:
                yield idx, min(100, n - idx * 100)
                idx += 1

    spark.udtf.register("chunk_text_q111", ChunkText)
    d = _t(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("docs_q111")
    return spark.sql(
        "SELECT doc_id, t.chunk_idx, t.chunk_len "
        "FROM docs_q111, LATERAL chunk_text_q111(text) t"
    )


@_register(
    "q112_arrow_norm_stats",
    """
    WITH n AS (
      SELECT label,
             sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x),
                                 'sum')) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(nrm), 6)       AS avg_norm,
           round(min(nrm), 6)       AS min_norm,
           round(max(nrm), 6)       AS max_norm
    FROM n GROUP BY label
    """,
)
def q112_arrow_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm profile through ``mapInArrow`` — the zero-copy
    Arrow batch API (no pandas conversion at all; columns arrive as
    pyarrow arrays).  Completes the Python-crossing matrix: pandas_udf,
    mapInPandas, applyInPandas(+State), cogroup, UDTF, and now raw
    Arrow.  Numerics are float64 squares of the float32 values, summed
    per vector — the same fold the oracle's list_aggregate runs."""
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            labels = batch.column("label")
            embs = batch.column("embedding")
            # flatten() honors any slice offset; .values would not
            flat = np.asarray(embs.flatten(), dtype=np.float64)
            mat = flat.reshape(len(embs), -1)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            yield pa.RecordBatch.from_arrays(
                [labels, pa.array(nrm, type=pa.float64())], ["label", "nrm"]
            )

    e = _t(spark, sf_dir, "embeddings").select("label", "embedding")
    n = e.mapInArrow(norms, schema="label int, nrm double")
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# Learned clustering + semantic dedup (SemDeDup) — extension surface
# ---------------------------------------------------------------------------

_KMEANS_MEMO: dict[tuple, list] = {}


def _kmeans_cents(spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3):
    """Fit-once for the Lloyd centroids: an in-process memo (tiny driver
    state, k x 64 doubles) over a disk-persisted model artifact
    (``fit_or_load_centroids``), so the driver's correctness run, bench
    and tests — separate processes — all share ONE fit per source
    dataset instead of refitting per query."""
    key = (sf_dir, k, iters)
    if key not in _KMEANS_MEMO:
        from stock_ops_spark.catalog import table_path
        from stock_ops_spark.operators.clustering import fit_or_load_centroids

        _KMEANS_MEMO[key] = fit_or_load_centroids(
            _t(spark, sf_dir, "embeddings"),
            source_path=table_path(sf_dir, "embeddings"),
            k=k,
            iters=iters,
            dim=64,
        )
    return _KMEANS_MEMO[key]


def _kmeans_cte() -> str:
    from stock_ops_spark.operators.clustering import kmeans_oracle_cte

    return kmeans_oracle_cte(k=8, iters=3, dim=64)


@_register(
    "q113_kmeans_clusters",
    f"""
    WITH {_kmeans_cte()},
    med AS (
      SELECT cid, vec_id FROM (
        SELECT cid, vec_id,
               row_number() OVER (PARTITION BY cid
                                  ORDER BY round(sqrt(dist_sq), 6), vec_id) AS rn
        FROM assign
      ) WHERE rn = 1
    )
    SELECT CAST(a.cid AS BIGINT)            AS cid,
           CAST(count(*) AS BIGINT)         AS n_points,
           CAST(any_value(m.vec_id) AS BIGINT) AS medoid,
           round(avg(sqrt(a.dist_sq)), 6)   AS mean_dist,
           round(max(sqrt(a.dist_sq)), 6)   AS max_dist
    FROM assign a JOIN med m USING (cid)
    GROUP BY a.cid
    """,
)
def q113_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k=8, 3 Lloyd iterations) over the embedding corpus — the
    learned-partition layer under semantic dedup and diversity sampling
    (operators/clustering.py).  Assignment is a map-side ``array_min``
    over k inline distance expressions (no join, no shuffle); recompute
    is one k-row shuffle of per-dimension partial sums; centroids are
    6-dp-quantized between iterations so both engines iterate over
    identical doubles.  The oracle replays the identical unrolled
    iterations as a CTE chain.  Output: per-cluster size, medoid
    (nearest-to-centroid, rounded-distance then id tiebreak), mean/max
    point-to-centroid distance."""
    from stock_ops_spark.operators.clustering import assign_clusters

    cents = _kmeans_cents(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings")
    a = assign_clusters(e, cents)
    d = F.sqrt(F.col("dist_sq"))
    return (
        a.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.min(
                F.struct(F.round(d, 6).alias("d"), F.col("vec_id").alias("v"))
            ).alias("_m"),
            F.round(F.avg(d), 6).alias("mean_dist"),
            F.round(F.max(d), 6).alias("max_dist"),
        )
        .select(
            F.col("cid").cast("bigint").alias("cid"),
            "n_points",
            F.col("_m.v").cast("bigint").alias("medoid"),
            "mean_dist",
            "max_dist",
        )
    )


@_register(
    "q114_semdedup",
    f"""
    WITH {_kmeans_cte()},
    mem AS (
      SELECT a.vec_id, a.cid, e.embedding
      FROM assign a JOIN embeddings e USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT y.vec_id, y.cid
      FROM mem x JOIN mem y ON x.cid = y.cid AND x.vec_id < y.vec_id
      WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.4
    ),
    c AS (SELECT cid, count(*) AS n FROM assign GROUP BY cid),
    d AS (SELECT cid, count(*) AS nd FROM dropped GROUP BY cid)
    SELECT CAST(c.cid AS BIGINT)                    AS cid,
           CAST(c.n AS BIGINT)                      AS n_points,
           CAST(coalesce(d.nd, 0) AS BIGINT)        AS n_dropped,
           CAST(c.n - coalesce(d.nd, 0) AS BIGINT)  AS n_kept
    FROM c LEFT JOIN d USING (cid)
    """,
)
def q114_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) on LEARNED clusters: k-means cells
    replace q36's ground-truth label as the blocking key — the shape a
    real corpus (no labels) actually runs.  Within each cell, any vector
    with a lower-id neighbor at cosine >= 0.4 is dropped (greedy keep-
    lowest-id, deterministic).  The pair stage routes through
    grid_self_pairs so a skew-hot cell never serializes into one
    quadratic task; per-row norms are staged once so each pair costs a
    single dot-product fold."""
    from stock_ops_spark.operators.clustering import assign_clusters
    from stock_ops_spark.operators.similarity import grid_self_pairs

    cents = _kmeans_cents(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings")
    a = assign_clusters(e, cents).select(
        "vec_id", "cid", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    pairs = grid_self_pairs(a, ["cid"], id_col="vec_id", grid=4)
    sim = V.dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    dropped = (
        pairs.where(sim >= 0.4)
        .select(F.col("cid"), F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    counts = a.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.join(dropped, "cid", "left")
        .select(
            F.col("cid").cast("bigint").alias("cid"),
            F.col("n").cast("bigint").alias("n_points"),
            F.coalesce(F.col("nd"), F.lit(0)).cast("bigint").alias("n_dropped"),
            (F.col("n") - F.coalesce(F.col("nd"), F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


@_register(
    "q115_temperature_sampling",
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS nmin FROM c),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN c USING (lang) CROSS JOIN m
      WHERE ((d.doc_id * 2654435761) % 1000000)
          * ((d.doc_id * 2654435761) % 1000000) * c.n
          < m.nmin * 1000000000000
    )
    SELECT c.lang,
           CAST(c.n AS BIGINT)                       AS n_docs,
           CAST(coalesce(k.nk, 0) AS BIGINT)         AS n_kept,
           round(sqrt(m.nmin::DOUBLE / c.n), 6)      AS target_rate
    FROM c CROSS JOIN m
    LEFT JOIN (SELECT lang, count(*) AS nk FROM kept GROUP BY lang) k USING (lang)
    """,
)
def q115_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing temperature sampling (alpha=0.5, the CCNet /
    multilingual-corpus convention): each language is downsampled toward
    the rarest language at rate sqrt(n_min/n_lang).  The keep decision is
    EXACT INTEGER arithmetic — u = (doc_id*2654435761) mod 1e6 kept iff
    u^2 * n_lang < n_min * 1e12 (the squared form of u/1e6 <
    sqrt(n_min/n_lang)) — zero floats in the cut, bit-identical across
    engines, reproducible across runs, pushed to the scan as a cheap
    predicate.  The per-language counts are a 5-row broadcast; n_lang *
    1e12 bounds the arithmetic to int64 up to ~9M docs per language
    (salt the modulus wider past that)."""
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    m = c.agg(F.min("n").alias("nmin"))
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000000))
    kept = (
        d.join(F.broadcast(c), "lang")
        .join(F.broadcast(m))
        .where(u * u * F.col("n") < F.col("nmin") * F.lit(1000000000000))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nk"))
    )
    return (
        c.join(F.broadcast(m))
        .join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n").cast("bigint").alias("n_docs"),
            F.coalesce(F.col("nk"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.round(
                F.sqrt(F.col("nmin").cast("double") / F.col("n")), 6
            ).alias("target_rate"),
        )
    )


@_register(
    "q116_supplier_rank_profile",
    """
    SELECT s_suppkey,
           n_name,
           round(s_acctbal, 2)                       AS acctbal,
           round(percent_rank() OVER w, 6)           AS pct_rank,
           round(cume_dist() OVER w, 6)              AS cum_dist,
           round(nth_value(s_acctbal, 2) OVER
                 (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
                                                     AS second_best
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q116_supplier_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-statistic window breadth — percent_rank, cume_dist, and
    nth_value over a full-partition frame — per-nation supplier account
    standings.  One window partition (nation) serves all three
    statistics: a single sort, a single exchange; the nation dim is a
    broadcast.  Deterministic under ties via the s_suppkey tiebreak."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
            F.round(F.nth_value("s_acctbal", 2).over(wf), 2).alias("second_best"),
        )
    )


@_register(
    "q117_signup_conversion_window",
    """
    SELECT s.event_id                       AS signup_id,
           s.user_id,
           CAST(count(p.event_id) AS BIGINT) AS n_purchases_1h,
           round(coalesce(sum(p.value), 0), 2) AS purchase_value_1h
    FROM events s
    LEFT JOIN events p
      ON p.event_type = 'purchase'
     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id, s.user_id
    """,
)
def q117_signup_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: global purchase activity in the hour after each
    signup.  A naive theta-join (p.ts BETWEEN ...) is a cartesian on a
    cluster; here each signup is exploded to its two covering hour
    buckets and the join is EQUI on the bucket — shuffle-partitionable,
    skew-bounded (each task sees one hour of each side), with the exact
    interval predicate applied after the bucket match.  LEFT join keeps
    zero-conversion signups."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(ts) DIV 3600000000")
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("s_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("b"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
        F.col("ts").alias("p_ts"),
        bucket.alias("b"),
    )
    hits = s.join(p, "b").where(
        (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    # bucket-exploded signups hit the same purchase at most once (the two
    # buckets cover disjoint purchase sets), so a plain re-aggregate on
    # the signup key restores exact per-signup counts
    agg = hits.groupBy("signup_id", "user_id").agg(
        F.count(F.lit(1)).alias("nh"), F.sum("p_value").alias("sv")
    )
    base = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id"
    )
    return base.join(agg, ["signup_id", "user_id"], "left").select(
        "signup_id",
        "user_id",
        F.coalesce(F.col("nh"), F.lit(0)).cast("bigint").alias("n_purchases_1h"),
        F.round(F.coalesce(F.col("sv"), F.lit(0.0)), 2).alias("purchase_value_1h"),
    )


# ---------------------------------------------------------------------------
# TPC-H decorrelation shapes (Q2 / Q21 / Q22 analogs on available columns)
# ---------------------------------------------------------------------------


@_register(
    "q118_cheapest_supplier_per_part",
    """
    WITH unit AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS u
      FROM lineitem GROUP BY 1, 2
    ),
    best AS (SELECT partkey, min(u) AS bu FROM unit GROUP BY 1)
    SELECT u.partkey,
           CAST(min(u.suppkey) AS BIGINT)  AS suppkey,
           round(min(b.bu), 6)             AS best_unit_price
    FROM unit u JOIN best b ON u.partkey = b.partkey AND u.u = b.bu
    GROUP BY u.partkey
    """,
)
def q118_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (groupwise-min + join-back, decorrelated): the
    supplier offering each part's minimum unit price.  The correlated
    ``WHERE cost = (SELECT min ...)`` becomes aggregate → equi-join —
    the Spark-idiomatic decorrelation (both aggregates partial-combine
    map-side; one shuffle each on the same key, reused).  Unit price
    uses MIN (order-independent, bit-exact across engines) rather than a
    float sum, so the join-on-double equality is deterministic; ties on
    price resolve to the lowest suppkey."""
    li = _t(spark, sf_dir, "lineitem")
    unit = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("u"))
    )
    best = unit.groupBy("partkey").agg(F.min("u").alias("bu"))
    return (
        unit.join(best, "partkey")
        .where(F.col("u") == F.col("bu"))
        .groupBy("partkey")
        .agg(
            F.min("suppkey").cast("bigint").alias("suppkey"),
            F.round(F.min("bu"), 6).alias("best_unit_price"),
        )
    )


@_register(
    "q119_sole_late_supplier",
    """
    WITH f AS (
      SELECT l.l_orderkey AS orderkey, l.l_suppkey AS suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT orderkey, count(*) AS nsupp, sum(late) AS nlate
      FROM f GROUP BY 1
    )
    SELECT f.suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM f JOIN agg USING (orderkey)
           JOIN supplier s ON s.s_suppkey = f.suppkey
    WHERE f.late = 1 AND agg.nsupp > 1 AND agg.nlate = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, f.suppkey
    LIMIT 25
    """,
)
def q119_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on
    multi-supplier orders (late = shipped >90 days after order date).
    The classic EXISTS (another supplier) / NOT EXISTS (another late
    supplier) pair decorrelates into one per-(order, supplier) flag
    aggregate and one per-order rollup — two shuffles on the order key
    instead of two correlated probes, then a broadcast supplier-name
    join and an integer-exact top-k."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), 1
    ).otherwise(0)
    f = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.max(late).alias("late"))
    )
    agg = f.groupBy("orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"), F.sum("late").alias("nlate")
    )
    return (
        f.join(agg, "orderkey")
        .where((F.col("late") == 1) & (F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(s), f.suppkey == s.s_suppkey)
        .groupBy("suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "suppkey")
        .limit(25)
    )


@_register(
    "q120_idle_rich_customers",
    """
    WITH ab AS (
      SELECT avg(c_acctbal) AS threshold FROM customer
      WHERE c_acctbal > 0
        AND c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'BUILDING')
    )
    SELECT c.c_mktsegment                 AS segment,
           CAST(count(*) AS BIGINT)       AS numcust,
           round(sum(c.c_acctbal), 2)     AS totacctbal
    FROM customer c CROSS JOIN ab
    WHERE c.c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'BUILDING')
      AND c.c_acctbal > ab.threshold
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY 1
    """,
)
def q120_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in target
    segments gone IDLE (no order since 2000 — every fixture customer has
    ordered at least once, so the literal never-ordered cut is empty).
    The scalar subquery is a 1-row broadcast (BroadcastNestedLoopJoin —
    the right plan for a scalar, not a shuffle); the NOT EXISTS is a
    left-anti join against the date-filtered orders (filter pushed below
    the join, so the anti side scans one partition-prunable slice)."""
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY", "BUILDING")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    ab = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("threshold"))
    return (
        c.join(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("threshold"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_register(
    "q121_streaming_cluster_assign",
    f"""
    WITH {_kmeans_cte()}
    SELECT CAST(cid AS BIGINT)      AS cid,
           CAST(count(*) AS BIGINT) AS n_assigned
    FROM assign GROUP BY cid
    """,
)
def q121_streaming_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE scoring against a trained index: the embedding stream is
    assigned to the batch-trained k-means centroids in flight — the
    assignment is the same map-side array_min expression as q113 (no
    state, no shuffle in the stream), counts aggregate at rest.
    availableNow drains the replay in one batch so the result equals the
    batch assignment — full SQL oracle over the identical unrolled
    Lloyd CTE.  This is the serving half of the cluster lifecycle: fit
    offline (q113), score every arriving vector online."""
    import os
    import shutil
    import tempfile
    import uuid

    from stock_ops_spark.catalog import table_path
    from stock_ops_spark.operators.clustering import assign_clusters

    cents = _kmeans_cents(spark, sf_dir)
    name = f"sassign_{uuid.uuid4().hex[:8]}"
    stream_dir = tempfile.mkdtemp(prefix="emb_stream_")
    ckpt_dir = tempfile.mkdtemp(prefix="assign_ckpt_")
    os.symlink(
        table_path(sf_dir, "embeddings"), os.path.join(stream_dir, "embeddings.parquet")
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        from stock_ops_spark.catalog import stream_table

        stream = stream_table(spark, sf_dir, "embeddings", stream_dir)
        scored = assign_clusters(stream, cents).select("vec_id", "cid")
        q = (
            scored.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_assigned"))
        .select(F.col("cid").cast("bigint").alias("cid"), "n_assigned")
    )


@_register(
    "q122_stateful_user_profile",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT)               AS n_events,
           round(sum(value), 2)                   AS total_value,
           round(max(value), 2)                   AS max_value,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
    FROM events
    WHERE value IS NOT NULL
    GROUP BY user_id
    """,
)
def q122_stateful_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-stateful streaming aggregation (ST4) through the driver
    contract: per-user running profile — scalar aggregate + per-type
    histogram as keyed state.  Two engines, one semantics
    (streaming/stateful.py:running_user_profile): Spark 4's
    ``transformWithStateInPandas`` (typed ValueState + MapState; under
    RocksDB each histogram entry is its own store key, so one update
    writes O(1), not O(|state|)) when its protobuf dependency exists,
    else ``applyInPandasWithState`` — this container ships no
    google.protobuf, so the TWS path is environment-gated like the
    media codecs.  availableNow over a single replay file is one
    micro-batch, so the final Update-mode row per key equals the batch
    aggregate — full SQL oracle; multi-batch accumulation is pinned in
    tests/test_services_stateful.py."""
    import os
    import shutil
    import tempfile
    import uuid

    from stock_ops_spark.catalog import stream_table, table_path
    from stock_ops_spark.session import STATE_STORE_PROVIDERS
    from stock_ops_spark.streaming.stateful import (
        running_user_profile,
        tws_available,
    )

    name = f"twsprof_{uuid.uuid4().hex[:8]}"
    stream_dir = tempfile.mkdtemp(prefix="events_tws_")
    ckpt_dir = tempfile.mkdtemp(prefix="tws_ckpt_")
    os.symlink(table_path(sf_dir, "events"), os.path.join(stream_dir, "events.parquet"))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # transformWithState requires the RocksDB provider (its column-family
    # state layout) — a runtime SQL conf read at stream start; restored
    # after the drain so the rest of the registry keeps the session default
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    if tws_available():
        spark.conf.set(provider_key, STATE_STORE_PROVIDERS["rocksdb"])
    try:
        prof = running_user_profile(stream_table(spark, sf_dir, "events", stream_dir))
        q = (
            prof.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return spark.table(name).select(
        "user_id",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
        F.round("max_value", 2).alias("max_value"),
        "n_event_types",
    )
