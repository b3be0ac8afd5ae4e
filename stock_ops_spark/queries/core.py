"""Core SQL surface: star-schema aggregates, joins, windows, set ops, the flagship session-OHLC/as-of pair, text/similarity/near-dup suites, SQL breadth (q01-q86).

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
    _local_df,
    _neardup_pairs,
    _register,
    _rev4,
    _t,
)

# ---------------------------------------------------------------------------
# Star-schema scan/filter/aggregate (P1-P4, A5-A7, O1)
# ---------------------------------------------------------------------------


@_register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT)                                   AS count_order,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)          AS sum_disc_price,
           round(avg(l_quantity), 6)                                  AS avg_qty,
           round(avg(l_extendedprice), 6)                             AS avg_price,
           round(avg(l_discount), 6)                                  AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: pushed-down range filter (P4) +
    hash aggregate with map-side partial aggregation (A5/A6 analogue).
    One shuffle on the 4-value grouping key; the scan reads only 7 columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
    )


@_register(
    "q02_revenue_topk_orders",
    """
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d')                        AS orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)      AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q02_revenue_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + group + global top-k (O2 pattern).  The join keys
    are both the natural partitioning (orderkey), so Catalyst plans a single
    shuffle shared by join and aggregate; top-k is TakeOrderedAndProject —
    no global sort materialization."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(rev.alias("__rev"))
        .orderBy(F.col("__rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("__rev", 4).alias("revenue"),
        )
    )


@_register(
    "q05_region_revenue",
    """
    SELECT r.r_name                                              AS region,
           n.n_name                                              AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           CAST(count(*) AS BIGINT)                              AS n_items
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact chain lineitem→orders shuffles once on orderkey; the
    dimension joins (customer, nation, region) are explicitly broadcast —
    at 100 TB the dims stay far under the broadcast threshold while the
    facts never reshuffle for them."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "q06_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           CAST(count(*) AS BIGINT)                    AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure pushed-down conjunctive range predicate (P4) + global agg
    (TPC-H Q6 shape).  All four predicates reach the parquet scan
    (PushedFilters) and row-group min/max stats skip non-matching chunks."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "q07_rollup_returnflag",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT)            AS n_rows,
           round(sum(l_extendedprice), 2)      AS sum_price
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q07_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (grouping-sets family).  Spark
    expands grouping sets in one Expand+HashAggregate pass — no repeated
    scans of the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Joins: semi / anti / existence (J1)
# ---------------------------------------------------------------------------


@_register(
    "q10_semi_join_customers",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q10_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J1 dedup-probe pattern): customers having at least
    one qualifying order.  Semi join never materializes order columns."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@_register(
    "q11_anti_join_customers",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q11_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J1 new-key probe): customers with no orders at all —
    the exact shape of the ingest dedup's 'which keys are new' step."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Window functions (O2, O5, A7 adjacents)
# ---------------------------------------------------------------------------


@_register(
    "q08_topk_parts_per_brand",
    """
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part)
    WHERE rn <= 3
    """,
)
def q08_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (O2 max-version-lookup shape).
    Spark rewrites rank-filter windows into a partial top-k before the
    shuffle (WindowGroupLimit) — no full per-group sort at scale."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@_register(
    "q09_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT)      AS gap_days
    FROM orders
    """,
)
def q09_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag window: days since the customer's previous order.
    One shuffle on o_custkey; the frame is the default running frame."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap_days"),
    )


@_register(
    "q19_latest_event_per_user_type",
    """
    SELECT user_id, event_type, event_id,
           round(value, 6)               AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def q19_latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 latest-version view: max-version (here: latest-timestamp) row per
    logical key, the engine's 'current' read view over the append-only log."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "version", F.row_number().over(
            Window.partitionBy("user_id", "event_type").orderBy(
                F.col("ts").asc(), F.col("event_id").asc()
            )
        )
    )
    latest = latest_version_view(ev, ["user_id", "event_type"])
    return latest.select(
        "user_id",
        "event_type",
        "event_id",
        F.round("value", 6).alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


# ---------------------------------------------------------------------------
# Set ops / distinct (O4)
# ---------------------------------------------------------------------------


@_register(
    "q12_active_users_union",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q12_active_users_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + distinct (O4 multi-file union with dedup)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.union(buys).distinct()


# ---------------------------------------------------------------------------
# Flagship: session OHLC + as-of (A7, J2)
# ---------------------------------------------------------------------------


@_register(
    "q13_session_ohlc",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d')  AS session_date,
           round(arg_min(value, ts), 6)            AS open,
           round(max(value), 6)                    AS high,
           round(min(value), 6)                    AS low,
           round(arg_max(value, ts), 6)            AS close,
           CAST(count(*) AS BIGINT)                AS n_trades
    FROM events
    WHERE event_type = 'purchase'
      AND strftime(ts, '%H:%M') >= '09:30'
      AND strftime(ts, '%H:%M') <= '16:00'
    GROUP BY CAST(ts AS DATE)
    """,
)
def q13_session_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 flagship: per-day session OHLC over trades-shaped events
    (purchase.value as price).  min_by/max_by ordered aggregates — a single
    hash aggregate, no window pass (see operators/ohlc.py)."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    out = session_ohlc(ev, F.col("ts"), F.col("value"))
    return out.select(
        F.date_format("session_date", "yyyy-MM-dd").alias("session_date"),
        F.round("open", 6).alias("open"),
        F.round("high", 6).alias("high"),
        F.round("low", 6).alias("low"),
        F.round("close", 6).alias("close"),
        F.col("n_trades").cast("bigint").alias("n_trades"),
    )


@_register(
    "q14_asof_nearest_purchase",
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
def q14_asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 as-of join: each signup matched to the user's nearest-in-time
    purchase (argmin |Δts|, backward wins ties).  Implemented as the
    union+window carry (operators/asof.py) — one shuffle on user_id, no
    cross product."""
    ev = _t(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    joined = asof_join_nearest(
        signups, purchases, on="ts", by=["user_id"], right_value_cols=["pval"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("pval_right", 6).alias("nearest_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Text analysis / dedup over documents (extension operators)
# ---------------------------------------------------------------------------


@_register(
    "q15_doc_fingerprint_dedup",
    """
    SELECT source,
           CAST(count(*) AS BIGINT)                        AS n_docs,
           CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
                AS BIGINT)                                 AS n_unique
    FROM documents
    GROUP BY source
    """,
)
def q15_doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup detection via content fingerprint: md5 of
    whitespace-normalized lowercased text (functions/text.py).  Hash-groupBy
    dedup — the exact-dedup baseline of the LLM-pipeline suite."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(TXT.fingerprint_md5(F.col("text"))).alias("n_unique"),
    )


@_register(
    "q16_token_stats_per_lang",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')))
                AS BIGINT)          AS total_tokens,
           round(avg(n_chars), 6)   AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def q16_token_stats_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokens, empty-filtered) aggregated per
    language — JVM-side split/filter/size, no UDF."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TXT.token_count(F.col("text")).cast("bigint")).cast("bigint").alias(
            "total_tokens"
        ),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


@_register(
    "q17_lang_id_confusion",
    """
    WITH padded AS (
      SELECT lang,
             ' ' || regexp_replace(lower(text), '\\s+', '  ', 'g') || ' ' AS ptext
      FROM documents
    ),
    scored AS (
      SELECT lang,
        len(regexp_extract_all(ptext, ' (the|and|of|to|is|in|that|with) '))   AS en,
        len(regexp_extract_all(ptext, ' (der|die|und|das|ist|nicht|mit|ein) ')) AS de,
        len(regexp_extract_all(ptext, ' (le|la|les|et|est|des|une|que) '))    AS fr,
        len(regexp_extract_all(ptext, ' (el|la|los|que|es|una|por|con) '))    AS es
      FROM padded
    )
    SELECT lang,
           CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                WHEN en = greatest(en, de, fr, es) THEN 'en'
                WHEN de = greatest(en, de, fr, es) THEN 'de'
                WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                ELSE 'es' END        AS guess,
           CAST(count(*) AS BIGINT)  AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
)
def q17_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by stopword vote (functions/text.py lang_guess), reported
    as a (true lang × guess) confusion matrix."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        *[
            TXT.stopword_hits_regex(F.col("text"), TXT.LANG_STOPWORDS[lang]).alias(
                f"__{lang}"
            )
            for lang in ("en", "de", "fr", "es")
        ],
    )
    return (
        scored.select(
            "lang",
            TXT.lang_guess_from_hits(
                F.col("__en"), F.col("__de"), F.col("__fr"), F.col("__es")
            ).alias("guess"),
        )
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings (extension operators)
# ---------------------------------------------------------------------------


@_register(
    "q18_cosine_topk",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT 10
    """,
)
def q18_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: dot/norm as JVM higher-order
    functions (functions/vector.py) over the full embeddings scan, top-k via
    TakeOrderedAndProject.  The query vector joins in via broadcast —
    at 100 TB this is one codegen'd scan, no shuffle except the final k."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sim = V.cosine(F.col("embedding"), F.col("qv"))
    return (
        e.where(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select("vec_id", "label", sim.alias("__sim"))
        .orderBy(F.col("__sim").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("__sim", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Time bucketing (P6/P7 analogue, ST3 derived bars)
# ---------------------------------------------------------------------------


@_register(
    "q20_hourly_event_bars",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           CAST(count(*) AS BIGINT)  AS n_events,
           round(sum(value), 2)      AS sum_value,
           round(min(value), 6)      AS min_value,
           round(max(value), 6)      AS max_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q20_hourly_event_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (1h) bars over the event stream — the batch twin of
    the Structured Streaming derived-bars operator (ST3)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("__b"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            F.date_format("__b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


# ---------------------------------------------------------------------------
# Near-dup dedup suite (extension): minhash LSH + exact verify
# ---------------------------------------------------------------------------


@_register(
    "q21_minhash_near_dup",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
                                          i -> substr(lower(text), i, 8))) AS s
      FROM documents
    )
    SELECT a.doc_id                                    AS id_a,
           b.doc_id                                    AS id_b,
           round(len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))), 6)
                                                       AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
          / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    """,
)
def q21_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate document pairs: 8-char shingles → 64-hash minhash →
    16-band LSH candidates → exact Jaccard ≥ 0.5 verification
    (operators/dedup.py).  The oracle brute-forces all pairs; LSH recall at
    the corpus's planted ≥0.9 level is 1-6e-8, so the verified outputs
    coincide.  At 100 TB only the LSH path is feasible — candidate
    generation is an equi-join on band buckets, never an all-pairs product."""
    out = _neardup_pairs(spark, sf_dir)
    return out.select(
        F.col("id_a"), F.col("id_b"), F.round("jaccard", 6).alias("jaccard")
    )


@_register(
    "q22_knn_join_sample",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
      FROM embeddings e JOIN q ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, c,
             row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, round(c, 6) AS cos_sim
    FROM ranked WHERE rn = 1
    """,
)
def q22_knn_join_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-NN join for a 20-query batch (operators/similarity.py
    knn_join): queries broadcast, corpus scanned once, per-query top-k via
    ranking window (WindowGroupLimit keeps k rows pre-shuffle)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = knn_join(e, q, k=1)
    return out.select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))


@_register(
    "q23_simhash_hamming_hist",
    """
    WITH sk AS (
      SELECT vec_id,
             len(list_filter(range(1, 65), i -> embedding[i] > 0)) AS pos_bits,
             embedding
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM sk WHERE vec_id < 20)
    SELECT len(list_filter(range(1, 65),
               i -> (s.embedding[i] > 0) <> (q.qe[i] > 0))) // 8 AS hamming_octile,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM sk s JOIN q ON s.vec_id > q.qid
    GROUP BY 1
    """,
)
def q23_simhash_hamming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (sign-random-projection) sketch distance histogram: 64-bit
    sign sketch per vector (functions/vector.py simhash64), hamming distance
    via bit_count(xor) — the blocking primitive behind
    simhash_bucketed_pairs, validated against element-wise sign compare."""
    e = _t(spark, sf_dir, "embeddings")
    sk = e.select("vec_id", V.simhash64(F.col("embedding")).alias("sk"))
    q = sk.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("sk").alias("qsk")
    )
    return (
        sk.join(F.broadcast(q), F.col("vec_id") > F.col("qid"))
        .select(
            (V.hamming64(F.col("sk"), F.col("qsk")) / 8)
            .cast("bigint")
            .alias("hamming_octile")
        )
        .groupBy("hamming_octile")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@_register(
    "q24_ivf_topk",
    """
    WITH el AS (
      SELECT label, i, embedding[i]::DOUBLE AS v
      FROM embeddings, unnest(range(1, 65)) AS t(i)
    ),
    cent AS (
      SELECT label, list(avg ORDER BY i) AS centroid
      FROM (SELECT label, i, avg(v) AS avg FROM el GROUP BY label, i)
      GROUP BY label
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    probed AS (
      SELECT c.label
      FROM cent c, q
      ORDER BY list_cosine_similarity(c.centroid, q.qv) DESC, c.label
      LIMIT 2
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.label IN (SELECT label FROM probed) AND e.vec_id <> 0
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT 10
    """,
)
def q24_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (the 100 TB scale path, operators/similarity.py):
    per-label mean centroids, probe the 2 nearest cells, exact search only
    inside them — the corpus is filtered by cluster BEFORE any distance
    math (partition pruning with a cluster-partitioned layout)."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    out = ivf_topk(e.where(F.col("vec_id") != 0), qv, k=10, nprobe=2)
    lab = e.select("vec_id", "label")
    return (
        out.join(F.broadcast(lab), "vec_id")
        .select("vec_id", "label", F.round("cos_sim", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Text quality / multimodal / time-normalization (extension)
# ---------------------------------------------------------------------------


@_register(
    "q25_quality_by_source",
    """
    WITH t AS (
      SELECT source,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
             length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio
      FROM documents
    ),
    s AS (
      SELECT source,
             list_sum(list_transform(toks, x -> length(x)))::DOUBLE
               / greatest(len(toks), 1) AS mtl,
             punct_ratio
      FROM t
    ),
    scored AS (
      SELECT source,
             round((CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.5 END)
                   * (1.0 - least(punct_ratio * 2, 1.0)), 6) AS q
      FROM s
    )
    SELECT source,
           round(avg(q), 6)         AS avg_quality,
           round(min(q), 6)         AS min_quality,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM scored GROUP BY source
    """,
)
def q25_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristic (functions/text.py quality_score):
    mean-token-length band × punctuation penalty, aggregated per source —
    the filter stage of an LLM-data pipeline."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select("source", TXT.quality_score(F.col("text")).alias("q"))
    return scored.groupBy("source").agg(
        F.round(F.avg("q"), 6).alias("avg_quality"),
        F.round(F.min("q"), 6).alias("min_quality"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@_register(
    "q26_media_blob_stats",
    """
    SELECT 'doc_text'                              AS modality,
           CAST(count(*) AS BIGINT)                AS n_items,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    """,
)
def q26_media_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing (operators/multimodal.py): text →
    BinaryType payload + metadata, byte accounting over the blob column.
    (The codec step itself is a mapInPandas stub — see extract_features.)"""
    d = _t(spark, sf_dir, "documents")
    media = media_from_text(d, "doc_id", "text", "doc_text")
    out = metadata_only_stats(media)
    mx = media.agg(F.max(F.octet_length("payload")).alias("mx")).select("mx")
    return (
        out.join(F.broadcast(mx))
        .select(
            "modality",
            "n_items",
            F.col("total_bytes").cast("bigint").alias("total_bytes"),
            F.col("mx").cast("bigint").alias("max_bytes"),
        )
    )


@_register(
    "q27_ts_unit_normalization",
    """
    WITH t AS (
      -- epoch(ts)::BIGINT would ROUND fractional seconds (Spark truncates);
      -- floor-divide the exact ms count instead
      SELECT epoch_ms(ts) // 1000 AS s, epoch_ms(ts)::BIGINT AS ms, epoch_us(ts)::BIGINT AS us
      FROM events
    ),
    n AS (
      SELECT s,
             CASE WHEN s  < 100000000000 THEN s
                  WHEN s  < 100000000000000 THEN s  // 1000
                  ELSE s  // 1000000 END AS norm_s,
             CASE WHEN ms < 100000000000 THEN ms
                  WHEN ms < 100000000000000 THEN ms // 1000
                  ELSE ms // 1000000 END AS norm_ms,
             CASE WHEN us < 100000000000 THEN us
                  WHEN us < 100000000000000 THEN us // 1000
                  ELSE us // 1000000 END AS norm_us
      FROM t
    )
    SELECT CAST(count(*) AS BIGINT)                                   AS n_rows,
           CAST(sum(CASE WHEN norm_s = norm_ms AND norm_ms = norm_us
                         THEN 1 ELSE 0 END) AS BIGINT)                AS n_consistent,
           min(norm_s)                                                AS min_epoch_s,
           max(norm_s)                                                AS max_epoch_s
    FROM n
    """,
)
def q27_ts_unit_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 magnitude-based epoch unit detection (functions/timeutils.py,
    thresholds 1e11/1e14 replicated from the reference): the same instant
    expressed as s/ms/µs must normalize to one epoch-seconds value."""
    from stock_ops_spark.functions.timeutils import normalize_ts_to_seconds

    ev = _t(spark, sf_dir, "events")
    t = ev.select(
        F.unix_seconds("ts").alias("s"),
        F.unix_millis("ts").alias("ms"),
        F.unix_micros("ts").alias("us"),
    )
    n = t.select(
        normalize_ts_to_seconds(F.col("s")).alias("norm_s"),
        normalize_ts_to_seconds(F.col("ms")).alias("norm_ms"),
        normalize_ts_to_seconds(F.col("us")).alias("norm_us"),
    )
    return n.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                (F.col("norm_s") == F.col("norm_ms"))
                & (F.col("norm_ms") == F.col("norm_us")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_consistent"),
        F.min("norm_s").alias("min_epoch_s"),
        F.max("norm_s").alias("max_epoch_s"),
    )


# ---------------------------------------------------------------------------
# More window frames / grouping sets / set ops
# ---------------------------------------------------------------------------


@_register(
    "q28_rolling_revenue_7d",
    """
    WITH daily AS (
      SELECT o_orderdate AS d, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_orderdate
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(rev, 2)           AS revenue,
           round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
                                   AS rolling_avg_7,
           round(sum(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
                                   AS rolling_sum_7
    FROM daily
    """,
)
def q28_rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frame (ROWS BETWEEN): 7-row rolling mean/sum of
    daily order revenue — the rolling-stats frame-spec operator."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round("rev", 2).alias("revenue"),
        F.round(F.avg("rev").over(w), 4).alias("rolling_avg_7"),
        F.round(F.sum("rev").over(w), 2).alias("rolling_sum_7"),
    )


@_register(
    "q29_cube_order_status",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT)   AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q29_cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders — one Expand + HashAggregate pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@_register(
    "q30_distinct_counts",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT)                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q30_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column exact distinct aggregation (Expand-based plan).  The
    approximate twin (approx_count_distinct/HLL) is the scale path but its
    estimates are impl-specific — kept out of the oracle-gated surface."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "q31_daily_activity_fullouter",
    """
    WITH c AS (SELECT CAST(ts AS DATE) AS d, count(*) AS clicks
               FROM events WHERE event_type = 'click' GROUP BY 1),
    p AS (SELECT CAST(ts AS DATE) AS d, count(*) AS purchases
          FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT strftime(coalesce(c.d, p.d), '%Y-%m-%d') AS day,
           CAST(coalesce(c.clicks, 0) AS BIGINT)    AS clicks,
           CAST(coalesce(p.purchases, 0) AS BIGINT) AS purchases
    FROM c FULL OUTER JOIN p ON c.d = p.d
    """,
)
def q31_daily_activity_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two daily aggregates (J3 union-shape pattern:
    two record shapes coexisting with NULL-padded sides)."""
    ev = _t(spark, sf_dir, "events")
    c = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("clicks"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("purchases"))
    )
    return (
        c.join(p, "d", "full_outer")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce("clicks", F.lit(0)).cast("bigint").alias("clicks"),
            F.coalesce("purchases", F.lit(0)).cast("bigint").alias("purchases"),
        )
    )


# ---------------------------------------------------------------------------
# Sessionization / percentiles / JSON / tokenization / calendar (P6-P8, ST3)
# ---------------------------------------------------------------------------


@_register(
    "q32_word_token_stats",
    """
    WITH t AS (
      SELECT lang,
             list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT lang,
           CAST(sum(len(toks)) AS BIGINT)                                   AS total_words,
           round(avg(len(toks)), 6)                                         AS avg_words,
           CAST(sum(len(list_filter(toks, x -> length(x) = 1))) AS BIGINT)  AS single_char_words
    FROM t GROUP BY lang
    """,
)
def q32_word_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish word tokenization (functions/text.py word_tokens: split on
    non-letter/digit runs) — subword-tokenizer pre-splitting stats per
    language, incl. single-char token counts (CJK-heavy text signal)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("lang", TXT.word_tokens(F.col("text")).alias("toks"))
    return toks.groupBy("lang").agg(
        F.sum(F.size("toks").cast("bigint")).cast("bigint").alias("total_words"),
        F.round(F.avg(F.size("toks")), 6).alias("avg_words"),
        F.sum(
            F.size(F.filter(F.col("toks"), lambda x: F.length(x) == 1)).cast("bigint")
        )
        .cast("bigint")
        .alias("single_char_words"),
    )


@_register(
    "q33_user_sessions",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT)         AS n_events
    FROM ordered GROUP BY user_id
    """,
)
def q33_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (ST3 session windows): 30-minute-gap sessions per
    user via the gaps-and-islands window pattern — one shuffle on user_id.
    (Streaming twin: ``session_window`` in streaming/ingest.py.)"""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in epoch *milliseconds* (unix_millis), matching the oracle's
    # epoch_ms comparison exactly — truncated-seconds gaps misclassify
    # boundaries within 1s of the 30-minute cutoff (ADVICE r1).
    gap = F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)
    marked = ev.select(
        "user_id",
        F.when(gap.isNull() | (gap > 1_800_000), 1).otherwise(0).alias("new_session"),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@_register(
    "q34_value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           round(max(value), 6)                 AS vmax
    FROM events GROUP BY event_type
    """,
)
def q34_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``).  The 100 TB path swaps in
    ``approx_percentile`` (t-digest) — estimates are impl-specific, so the
    exact form is the oracle-gated one."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


@_register(
    "q35_json_props",
    """
    SELECT event_type,
           CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
           CAST(count(*) FILTER (json_extract(props, '$.k')::BIGINT > 50) AS BIGINT)
                                                                   AS n_high,
           CAST(count(*) AS BIGINT)                                AS n_rows
    FROM events GROUP BY event_type
    """,
)
def q35_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decode at the boundary (reference S3/S4 encode/decode):
    get_json_object over the props column, aggregated — stays JVM-side."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("bigint").alias("n_high"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "q36_embedding_neardup_pairs",
    """
    SELECT a.vec_id                                                       AS id_a,
           b.vec_id                                                       AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                                                                          AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.vec_id < b.vec_id AND a.label = b.label
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def q36_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by cluster label: the join
    is label-equi (never an unblocked cross product), then exact cosine ≥
    0.4 — the verification-tier of embedding dedup.  At 100 TB the label
    comes from coarse quantization (see ivf_topk) and each cell joins
    within itself."""
    from stock_ops_spark.operators.similarity import grid_self_pairs

    e = _t(spark, sf_dir, "embeddings")
    # precompute each row's norm ONCE: the pair stage then evaluates a
    # single dot-product fold per pair instead of three (dot + two norms),
    # cutting the higher-order-function work by ~3x
    withn = e.select(
        "vec_id", "label", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    # grid decomposition bounds every join task to a (cell/grid)² pair
    # sub-square — a skew-hot label no longer serializes into one
    # quadratic task (exact semantics preserved; see grid_self_pairs)
    pairs = grid_self_pairs(withn, ["label"], id_col="vec_id", grid=4)
    sim = V.dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("__s"),
        )
        .where(F.col("__s") >= 0.4)
        .select("id_a", "id_b", F.round("__s", 6).alias("cos_sim"))
    )


@_register(
    "q37_order_months_spanned",
    """
    WITH months AS (
      SELECT o_custkey,
             unnest(generate_series(date_trunc('month', min(o_orderdate)),
                                    date_trunc('month', max(o_orderdate)),
                                    INTERVAL 1 MONTH)) AS m
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT)       AS n_months,
           strftime(min(m), '%Y-%m')      AS first_month,
           strftime(max(m), '%Y-%m')      AS last_month
    FROM months GROUP BY o_custkey
    """,
)
def q37_order_months_spanned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 calendar period enumeration: inclusive month sequence between two
    endpoints via ``sequence`` + ``explode`` — the declarative twin of the
    reference's period_from_unix generator (database/utils.py:26-119)."""
    o = _t(spark, sf_dir, "orders")
    spans = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    months = spans.select(
        "o_custkey",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("m"),
    )
    return months.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.min(F.date_format("m", "yyyy-MM")).alias("first_month"),
        F.max(F.date_format("m", "yyyy-MM")).alias("last_month"),
    )


# ---------------------------------------------------------------------------
# SQL-surface breadth: HAVING / subqueries / NOT IN / LIKE (Q4/Q16/Q18/Q22 shapes)
# ---------------------------------------------------------------------------


@_register(
    "q38_big_orders_having",
    """
    SELECT o.o_orderkey,
           CAST(count(*) AS BIGINT)    AS n_items,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    HAVING sum(l.l_quantity) > 150
    """,
)
def q38_big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join + group + HAVING on the aggregate (post-
    aggregation filter, evaluated after the merge aggregate)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("__tq"),
        )
        .where(F.col("__tq") > 150)
        .select("o_orderkey", "n_items", F.round("__tq", 2).alias("total_qty"))
    )


@_register(
    "q39_above_avg_customers",
    """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
    """,
)
def q39_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global aggregate) as a filter
    bound — Spark plans it as a broadcast scalar subquery, one extra tiny
    job, no per-row recomputation."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))
    )


@_register(
    "q40_late_ship_orders",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q40_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality on both sides'
    columns — planned as a left-semi join with a non-equi condition on top
    of the orderkey equi-join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.date_add(o.o_orderdate, 90)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@_register(
    "q41_never_ordered_parts",
    """
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
    GROUP BY p_brand
    """,
)
def q41_never_ordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN anti-join (null-aware: the subquery column is non-null here,
    so it degenerates to a plain left-anti join)."""
    p = _t(spark, sf_dir, "part")
    heavy = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48).select(
        "l_partkey"
    )
    return (
        p.join(heavy, p.p_partkey == heavy.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@_register(
    "q42_part_name_patterns",
    """
    SELECT p_type,
           CAST(count(*) AS BIGINT)                              AS n_parts,
           CAST(count(*) FILTER (p_name LIKE '%a%') AS BIGINT)   AS with_a,
           CAST(count(*) FILTER (upper(p_brand) LIKE 'BRAND#1%') AS BIGINT) AS brand1x,
           min(substr(p_name, 1, 4))                             AS first_prefix
    FROM part GROUP BY p_type
    """,
)
def q42_part_name_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String predicate suite (P8 adjacents): LIKE patterns, upper(),
    substring, conditional counts — all codegen'd string intrinsics."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.when(F.col("p_name").like("%a%"), 1).otherwise(0))
        .cast("bigint")
        .alias("with_a"),
        F.sum(F.when(F.upper("p_brand").like("BRAND#1%"), 1).otherwise(0))
        .cast("bigint")
        .alias("brand1x"),
        F.min(F.substring("p_name", 1, 4)).alias("first_prefix"),
    )


# ---------------------------------------------------------------------------
# Approximate / streaming-only operators — rows-only checks (no SQL oracle)
# ---------------------------------------------------------------------------


@_register("q43_approx_distinct_sketch", None)
def q43_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (the 100 TB path for q30-style
    cardinalities: one pass, fixed memory, mergeable sketches).  Estimates
    are implementation-specific → rows-only check; the exact twin is
    q30_distinct_counts."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register("q44_approx_percentile_tdigest", None)
def q44_approx_percentile_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (mergeable, bounded-memory) — the scale
    path for q34; estimates impl-specific → rows-only."""
    ev = _t(spark, sf_dir, "events")
    # scalar output columns (not array<double>): the driver canonicalizer
    # sorts/hashes cell values and cannot handle list cells (VERDICT r1).
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.9, 10000).alias("p90"),
        F.percentile_approx("value", 0.99, 10000).alias("p99"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register("q45_streaming_bars_demo", None)
def q45_streaming_bars_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming derived bars (ST3) driven end-to-end through
    the contract: the events parquet replayed as a file stream →
    watermarked 1h tumbling OHLC bars per event_type → collected after an
    availableNow drain.  Not SQL-expressible as a stream → rows-only.
    (Batch twin with oracle: q20_hourly_event_bars.)

    Output mode is ``complete`` on purpose: with availableNow the final
    windows never cross the watermark, so append mode would drop the last
    2 h of bars.  The memory-sink cardinality is bounded by
    |event_types| × |hours spanned| (≈ 3.4k rows at sf0.1) — a fixed bars
    grid, not data-proportional, so the driver-memory risk is bounded by
    construction."""
    import shutil
    import tempfile
    import uuid

    from stock_ops_spark.catalog import stream_table, table_path

    name = f"bars_demo_{uuid.uuid4().hex[:8]}"
    # file streaming source requires a directory: expose the events file
    # through a temp dir symlink; schema is discovered from the parquet
    # footer and ts normalized exactly like the batch path (stream_table)
    import os

    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    ckpt_dir = tempfile.mkdtemp(prefix="bars_ckpt_")
    os.symlink(table_path(sf_dir, "events"), os.path.join(stream_dir, "events.parquet"))
    try:
        ev = stream_table(spark, sf_dir, "events", stream_dir)
        bars = (
            ev.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
            .agg(
                F.min_by("value", "ts").alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", "ts").alias("close"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
                "event_type",
                "open",
                "high",
                "low",
                "close",
                "n_events",
            )
        )
        q = (
            bars.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        # the memory sink holds the result; the source dir and checkpoint
        # are dead weight once the availableNow drain finished
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return spark.table(name)


@_register(
    "q46_validation_counts",
    """
    WITH v AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS iso,
             o_totalprice,
             epoch_ms(o_orderdate) // 1000     AS epoch_s
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN regexp_matches(iso, '^\\d{4}-\\d{2}-\\d{2}$')
                          AND try_cast(iso AS DATE) IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT)                    AS n_valid_iso,
           CAST(sum(CASE WHEN epoch_s >= 0 AND epoch_s < 100000000000
                         THEN 1 ELSE 0 END) AS BIGINT)                    AS n_valid_epoch_s,
           CAST(sum(CASE WHEN try_cast(substr(iso, 1, 4) AS BIGINT) BETWEEN 1990 AND 2010
                         THEN 1 ELSE 0 END) AS BIGINT)                    AS n_year_in_range
    FROM v
    """,
)
def q46_validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 validation predicates (reference validate_isodatestr /
    validate_utc_ts, data/utils.py:148-171): strict ISO-date regex +
    parse check, epoch-seconds range check, year bounds — as filters over
    string-typed boundary data, all codegen'd."""
    from stock_ops_spark.functions.timeutils import is_valid_epoch, is_valid_isodate

    o = _t(spark, sf_dir, "orders")
    v = o.select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ms"),
    ).select("iso", (F.col("ms") / 1000).cast("long").alias("epoch_s"))
    return v.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(is_valid_isodate(F.col("iso")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid_iso"),
        F.sum(F.when(is_valid_epoch(F.col("epoch_s"), "s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid_epoch_s"),
        F.sum(
            F.when(
                F.try_to_number(F.substring("iso", 1, 4), F.lit("9999")).between(
                    1990, 2010
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_year_in_range"),
    )


# ---------------------------------------------------------------------------
# Pivot / set ops / ordered array aggregation
# ---------------------------------------------------------------------------


@_register(
    "q47_pivot_daily_event_mix",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
           CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def q47_pivot_daily_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): daily counts per event type as columns.  A
    fixed pivot-value list keeps the schema static (required at scale — an
    unbounded pivot collects distinct values to the driver first)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "day",
            *[F.col(c).cast("bigint").alias(c) for c in ("click", "error", "purchase", "signup", "view")],
        )
    )


@_register(
    "q48_set_ops_buyers",
    """
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'click_and_buy' AS cohort, CAST(count(*) AS BIGINT) AS n FROM
      (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
    UNION ALL
    SELECT 'click_no_buy' AS cohort, CAST(count(*) AS BIGINT) AS n FROM
      (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
    """,
)
def q48_set_ops_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (planned as left-semi/anti under
    the hood) over user cohorts."""
    ev = _t(spark, sf_dir, "events")
    clickers = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(buyers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("click_and_buy").alias("cohort"), "n"
    )
    only = clickers.exceptAll(buyers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("click_no_buy").alias("cohort"), "n"
    )
    return both.unionByName(only)


@_register(
    "q49_user_event_type_profile",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
           CAST(count(DISTINCT event_type) AS BIGINT)                 AS n_types,
           CAST(count(*) AS BIGINT)                                   AS n_events
    FROM events GROUP BY user_id
    """,
)
def q49_user_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: collect_set → array_sort → join to a
    deterministic string (collect order is nondeterministic under
    parallelism; the sort makes the output stable — the required pattern
    for any list-valued result at scale)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "types_seen"
        ),
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@_register(
    "q50_click_attribution",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id,
           p.user_id,
           CAST(count(c.ts) AS BIGINT) AS clicks_prev_hour
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts >  p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def q50_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: purchases attributed to same-user clicks in
    the preceding hour.  The equi key (user_id) carries the shuffle; the
    time-range predicate filters inside each key group — never a cross
    product, and AQE handles hot users."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"), F.col("ts").alias("cts")
    )
    cond = (
        (p.user_id == c.cuser)
        & (c.cts > p.pts - F.expr("INTERVAL 1 HOUR"))
        & (c.cts <= p.pts)
    )
    return (
        p.join(c, cond, "left")
        .groupBy("event_id", "user_id")
        .agg(F.count("cts").alias("clicks_prev_hour"))
    )


@_register(
    "q51_above_brand_avg_parts",
    """
    WITH cents AS (
      SELECT p_brand, p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS pc
      FROM part
    ),
    w AS (
      SELECT p_brand, p_partkey, pc,
             sum(pc)   OVER (PARTITION BY p_brand) AS s,
             count(*)  OVER (PARTITION BY p_brand) AS n
      FROM cents
    )
    SELECT p_brand, p_partkey,
           round(pc / 100.0, 2)            AS price,
           round(s / n / 100.0, 4)         AS brand_avg
    FROM w
    WHERE pc * n > s
    """,
)
def q51_above_brand_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-group scalar (parts above their brand's average) via
    an analytic window — one shuffle on brand, no self-join, no
    decorrelation needed."""
    p = _t(spark, sf_dir, "part")
    # exact integer-cent arithmetic: float averages land on rounding
    # boundaries (observed: a brand avg of exactly .59375 rounded
    # differently per engine's summation order), so the filter and the
    # reported average both derive from integer sums
    cents = p.select(
        "p_brand",
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("pc"),
    )
    w = Window.partitionBy("p_brand")
    return (
        cents.withColumn("s", F.sum("pc").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.col("pc") * F.col("n") > F.col("s"))
        .select(
            "p_brand",
            "p_partkey",
            F.round(F.col("pc") / 100.0, 2).alias("price"),
            F.round(F.col("s") / F.col("n") / 100.0, 4).alias("brand_avg"),
        )
    )


@_register(
    "q52_unpivot_event_mix",
    """
    WITH wide AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase
      FROM events GROUP BY 1
    )
    SELECT day, kind, n FROM (
      SELECT day, 'click' AS kind, click AS n FROM wide
      UNION ALL
      SELECT day, 'purchase' AS kind, purchase AS n FROM wide
    )
    """,
)
def q52_unpivot_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via the melt/unpivot operator — the inverse
    of q47, showing both reshaping directions stay JVM-side."""
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", ["click", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select("day", F.col("click").cast("bigint"), F.col("purchase").cast("bigint"))
    )
    return wide.unpivot("day", ["click", "purchase"], "kind", "n")


@_register(
    "q53_grouping_id_rollup",
    """
    SELECT coalesce(l_returnflag, '<all>')  AS returnflag,
           coalesce(l_linestatus, '<all>')  AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT)         AS n_rows
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q53_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() indicators: distinguishes real NULL group
    values from subtotal rows — the metadata the stats-catalog views use
    to label '<all>' aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "n_rows",
        )
    )


@_register(
    "q54_nation_pair_volume",
    """
    SELECT sn.n_name                                           AS supp_nation,
           cn.n_name                                           AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT)                 AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name < cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(o.o_orderdate)
    """,
)
def q54_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair shipping volume by year —
    two aliases of the same broadcast dim (nation) joined through supplier
    and customer sides of the fact chain."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("volume")
        )
    )


@_register(
    "q55_promo_revenue_share",
    """
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           round(100.0 * sum(CASE WHEN p.p_type LIKE 'ECONOMY%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
           CAST(count(*) AS BIGINT)                                AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY year(l.l_shipdate)
    """,
)
def q55_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue share per year — CASE inside
    the aggregate, part dim broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("ECONOMY%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "q56_disjunctive_predicates",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           CAST(count(*) AS BIGINT)                              AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 5 AND l.l_quantity <= 25)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
       OR (p.p_type LIKE 'STANDARD%' AND l.l_discount > 0.08)
    """,
)
def q56_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    clauses across both join sides — exercises CNF conversion and partial
    pushdown of the common join key."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    )
    c2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 40)
    )
    c3 = F.col("p_type").like("STANDARD%") & (F.col("l_discount") > 0.08)
    return j.where(c1 | c2 | c3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "q57_windowed_dedup",
    """
    WITH b AS (
      SELECT *, epoch_ms(ts) // 300000 AS bucket
      FROM events
    ),
    r AS (
      SELECT user_id, event_type, bucket, value, ts, event_id,
             row_number() OVER (PARTITION BY user_id, event_type, bucket
                                ORDER BY ts, event_id) AS rn
      FROM b
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT)  AS n_kept,
           round(sum(value), 2)      AS sum_value
    FROM r WHERE rn = 1
    GROUP BY user_id, event_type
    """,
)
def q57_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed deduplication: keep the first event per (user, type,
    5-minute bucket) — the batch twin of streaming
    ``dropDuplicatesWithinWatermark``, and the telemetry-thinning /
    retry-collapse primitive of an event pipeline."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.unix_millis("ts") / 300000).cast("long")
    w = Window.partitionBy("user_id", "event_type", bucket.alias("b")).orderBy(
        "ts", "event_id"
    )
    kept = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return kept.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@_register(
    "q58_value_histogram",
    """
    SELECT event_type,
           CAST(least(greatest(floor(value / 20), 0), 19) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT)                                  AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q58_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20-unit bins, clamped to [0,19]) per event
    type — the profiling primitive behind skew detection and bin-packed
    partitioning decisions."""
    ev = _t(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 20), F.lit(0)), F.lit(19)
    ).cast("bigint")
    return ev.groupBy("event_type", bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )


@_register(
    "q59_last_click_before_signup",
    """
    WITH c AS (
      SELECT user_id, ts, max(value) AS cval
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT s.event_id, s.user_id,
           round((SELECT c.cval FROM c
                  WHERE c.user_id = s.user_id AND c.ts <= s.ts
                  ORDER BY c.ts DESC LIMIT 1), 6) AS last_click_value
    FROM events s
    WHERE s.event_type = 'signup'
    """,
)
def q59_last_click_before_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py asof_join_backward): each
    signup gets the user's most recent click at-or-before it — one shuffle
    on user_id via the union+window carry, NULL when no prior click."""
    from stock_ops_spark.operators.asof import asof_join_backward

    ev = _t(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cval"))
    )
    out = asof_join_backward(
        signups, clicks, on="ts", by=["user_id"], right_value_cols=["cval"]
    )
    return out.select(
        "event_id", "user_id", F.round("cval_right", 6).alias("last_click_value")
    )


# ---------------------------------------------------------------------------
# Training-data prep: chunking / scrubbing / deterministic sampling
# ---------------------------------------------------------------------------


@_register(
    "q60_doc_chunking",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, lang,
             i AS chunk_idx,
             list_slice(tk, i * 40 + 1, i * 40 + 50) AS chunk
      FROM toks, unnest(range(0, greatest((len(tk) + 39) // 40, 1))) AS t(i)
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, lang,
           CAST(len(chunk) AS BIGINT)                                    AS n_tokens,
           CAST(list_sum(list_transform(chunk, t -> length(t))) AS BIGINT) AS n_chars
    FROM chunks
    WHERE len(chunk) > 0
    """,
)
def q60_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training-data prep: 50-token windows with
    10-token overlap (stride 40) via sequence + explode + slice — all
    JVM-side array ops, one row per chunk, no UDF.  At 100 TB this is the
    map-side fan-out stage feeding tokenization."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", TXT.tokens(F.col("text")).alias("tk")
    ).localCheckpoint(eager=False)
    n_chunks = F.greatest(
        F.ceil(F.size("tk") / F.lit(40)).cast("int"), F.lit(1)
    )
    chunks = toks.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        F.col("tk"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "lang",
        F.slice(F.col("tk"), F.col("chunk_idx") * 40 + 1, 50).alias("chunk"),
    )
    return chunks.where(F.size("chunk") > 0).select(
        "doc_id",
        "chunk_idx",
        "lang",
        F.size("chunk").cast("bigint").alias("n_tokens"),
        F.aggregate(
            F.col("chunk"), F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
        ).alias("n_chars"),
    )


@_register(
    "q61_scrub_stats",
    """
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '\\d+'))) AS BIGINT) AS digit_runs,
           CAST(sum(length(text) - length(regexp_replace(text, '\\d', '', 'g')))
                AS BIGINT)                                            AS digit_chars,
           CAST(count(*) FILTER (regexp_matches(text, '\\d')) AS BIGINT) AS docs_with_digits
    FROM documents GROUP BY source
    """,
)
def q61_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrubbing/redaction accounting: digit-run detection per source —
    the measurement pass before PII masking (regexp_count / regexp_replace
    are the masking primitives)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.regexp_count("text", F.lit(r"\d+")).cast("bigint"))
        .cast("bigint")
        .alias("digit_runs"),
        F.sum(
            F.length("text") - F.length(F.regexp_replace("text", r"\d", ""))
        )
        .cast("bigint")
        .alias("digit_chars"),
        F.sum(F.when(F.col("text").rlike(r"\d"), 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_digits"),
    )


@_register(
    "q62_systematic_sample",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT)        AS n_sampled,
           round(avg(value), 6)            AS avg_value
    FROM events
    WHERE user_id % 10 = 3
    GROUP BY event_type
    """,
)
def q62_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-10 systematic sample keyed on user_id — the
    reproducible sampling pattern for eval-split carving (TABLESAMPLE /
    rand() are engine-specific; key-hash buckets are portable and stable
    under re-partitioning)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.col("user_id") % 10 == 3)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@_register(
    "q63_first_last_order_value",
    """
    SELECT DISTINCT o_custkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_order_price,
           round(last_value(o_totalprice)  OVER w, 2) AS last_order_price,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q63_first_last_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit unbounded
    frame (the default running frame would make last_value = current row —
    the classic window-frame trap, avoided on both engines)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.round(F.first("o_totalprice").over(w), 2).alias("first_order_price"),
            F.round(F.last("o_totalprice").over(w), 2).alias("last_order_price"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias(
                "second_order_price"
            ),
        )
        .distinct()
    )


@_register(
    "q64_customer_quartiles",
    """
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ntile(4)       OVER w AS quartile,
             percent_rank() OVER w AS pr
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    )
    SELECT c_mktsegment,
           CAST(quartile AS BIGINT)   AS quartile,
           CAST(count(*) AS BIGINT)   AS n_customers,
           round(min(c_acctbal), 2)   AS min_bal,
           round(max(c_acctbal), 2)   AS max_bal,
           round(max(pr), 6)          AS max_pct_rank
    FROM ranked
    GROUP BY c_mktsegment, quartile
    """,
)
def q64_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank distribution windows: account-balance
    quartiles per market segment (fully tie-broken ordering keeps bucket
    assignment deterministic across engines)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return ranked.groupBy(
        "c_mktsegment", F.col("quartile").cast("bigint").alias("quartile")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.max("pr"), 6).alias("max_pct_rank"),
    )


@_register(
    "q65_embedding_dim_stats",
    """
    SELECT label,
           CAST(i - 1 AS BIGINT)      AS dim,
           round(avg(v), 6)           AS mean_v,
           round(min(v), 6)           AS min_v,
           round(max(v), 6)           AS max_v
    FROM (SELECT label, i, embedding[i]::DOUBLE AS v
          FROM embeddings, unnest(range(1, 9)) AS t(i))
    GROUP BY label, i
    """,
)
def q65_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (first 8 dims × label) via
    posexplode — the feature-drift / normalization profiling pass over a
    vector column.  One shuffle keyed (label, dim)."""
    e = _t(spark, sf_dir, "embeddings")
    el = e.select(
        "label",
        F.posexplode(F.slice("embedding", 1, 8)).alias("dim", "v"),
    ).select("label", "dim", F.col("v").cast("double").alias("v"))
    return el.groupBy("label", F.col("dim").cast("bigint").alias("dim")).agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )


@_register(
    "q66_price_quantity_correlation",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)        AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 6)       AS qty_disc_covar,
           round(stddev_samp(l_quantity), 6)                  AS qty_stddev,
           CAST(count(*) AS BIGINT)                           AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q66_price_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical co-aggregates (Pearson corr, sample covariance/stddev)
    — single-pass streaming moment computation on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "q67_null_aware_counts",
    """
    WITH g AS (
      SELECT c.c_mktsegment AS seg,
             date_diff('day',
               lag(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                                        ORDER BY o.o_orderdate, o.o_orderkey),
               o.o_orderdate) AS gap
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT seg,
           CAST(count(*) AS BIGINT)    AS n_orders,
           CAST(count(gap) AS BIGINT)  AS n_gaps,
           round(avg(gap), 6)          AS avg_gap,
           CAST(sum(CASE WHEN gap IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                       AS n_first_orders
    FROM g GROUP BY seg
    """,
)
def q67_null_aware_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-aware aggregation semantics: count(*) vs count(col) vs
    avg-ignores-NULL over the lag-generated NULLs (each customer's first
    order has no gap) — identical NULL treatment on both engines."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap"),
        )
    )
    return g.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.round(F.avg("gap"), 6).alias("avg_gap"),
        F.sum(F.when(F.col("gap").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_first_orders"),
    )


@_register(
    "q68_fixed_offset_days",
    """
    SELECT strftime(CAST(ts + INTERVAL 5 HOURS AS DATE), '%Y-%m-%d') AS local_day,
           CAST(count(*) AS BIGINT)  AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def q68_fixed_offset_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 timezone conversion in the oracle-gated surface: bucket events by
    local calendar day at a DST-free fixed offset (UTC+5) — Spark
    from_utc_timestamp('+05:00') ≡ plain interval shift, deterministic on
    both engines.  (IANA-zone conversions with DST live in
    functions/timeutils.py and the store tests, where Python zoneinfo is
    the oracle.)"""
    ev = _t(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts"), "+05:00")
    return ev.groupBy(
        F.date_format(F.to_date(local), "yyyy-MM-dd").alias("local_day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@_register(
    "q69_stream_stream_attribution",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id,
           p.user_id,
           CAST(count(*) AS BIGINT) AS clicks_prev_hour
    FROM p JOIN c
      ON p.user_id = c.user_id
     AND c.ts >  p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def q69_stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q50: purchases and clicks replayed as TWO file
    streams, interval-joined IN FLIGHT (watermarked stream-stream join,
    state bounded by watermark + tolerance — runs indefinitely at scale),
    pair counts aggregated at rest from the landed join output.

    availableNow over a single file processes both sides in one
    micro-batch, so the inner join's result is exactly its batch form —
    which is why this streaming query can carry a full SQL oracle
    (unmatched purchases drop out of the inner join on both engines).
    """
    import os
    import shutil
    import tempfile
    import uuid

    from stock_ops_spark.catalog import stream_table, table_path

    name = f"ss_attr_{uuid.uuid4().hex[:8]}"
    stream_dir = tempfile.mkdtemp(prefix="events_ssj_")
    ckpt_dir = tempfile.mkdtemp(prefix="ssj_ckpt_")
    os.symlink(table_path(sf_dir, "events"), os.path.join(stream_dir, "events.parquet"))
    # Join state lives in one store PER shuffle partition PER side; at this
    # availableNow demo's state volume 8 partitions cut runtime 3x vs 32.
    # (A live deployment sizes this to state volume / executor count —
    # the conf is restored after the drain.)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:

        def side(event_type: str, alias_ts: str):
            return (
                stream_table(spark, sf_dir, "events", stream_dir)
                .where(F.col("event_type") == event_type)
                .withColumn(alias_ts, F.col("ts"))
            )

        p = side("purchase", "pts").select(
            "event_id", "user_id", F.col("pts")
        ).withWatermark("pts", "2 hours")
        c = side("click", "cts").select(
            F.col("user_id").alias("cuser"), F.col("cts")
        ).withWatermark("cts", "2 hours")
        cond = (
            (p.user_id == c.cuser)
            & (c.cts > p.pts - F.expr("INTERVAL 1 HOUR"))
            & (c.cts <= p.pts)
        )
        pairs = p.join(c, cond).select("event_id", "user_id")
        q = (
            pairs.writeStream.outputMode("append")
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
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("clicks_prev_hour"))
    )


@_register(
    "q70_neardup_clusters",
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
    )
    SELECT component, CAST(count(*) AS BIGINT) AS size
    FROM comp GROUP BY component
    """,
)
def q70_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster formation: minhash-LSH near-dup pairs (q21's
    candidate+verify pipeline) → distributed connected components
    (operators/graph.py min-label propagation) → per-cluster size with
    the min doc_id as the canonical representative.  Unique docs appear
    as singleton clusters.  The oracle computes the same closure with a
    recursive CTE — feasible only at oracle scale; the propagation loop
    is the form that survives 100 TB."""
    from stock_ops_spark.operators.graph import cluster_summary, connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs, nodes=d.select("doc_id"))
    return cluster_summary(comp)


@_register(
    "q71_price_qty_regression",
    """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)       AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)   AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)          AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6)        AS avg_qty,
           round(regr_avgy(l_extendedprice, l_quantity), 4)        AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q71_price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_*): one pass, map-side
    partial — the statistical surface beyond corr/covar (q66).  Both
    engines implement the same ANSI regr_* definitions."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_qty"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_price"),
    )


@_register(
    "q72_region_nation_roster",
    """
    SELECT r.r_name,
           CAST(count(*) AS BIGINT)                    AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q72_region_nation_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered by contract,
    so determinism comes from array_sort before the join — the distributed
    equivalent of string_agg(... ORDER BY ...)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        )
    )


@_register(
    "q73_winnowing_fingerprints",
    """
    WITH codes AS (
      SELECT doc_id,
             list_transform(range(1, length(lower(text)) + 1),
                            i -> ord(substr(lower(text), i, 1))) AS c
      FROM documents
    ),
    kh AS (
      SELECT doc_id,
             CASE WHEN len(c) >= 8 THEN
               list_transform(range(1, len(c) - 8 + 2),
                              i -> list_sum(list_transform(range(0, 8),
                                            j -> c[i + j] * (31 ** (7 - j))))::BIGINT)
             ELSE [] END AS h
      FROM codes
    ),
    fp AS (
      SELECT doc_id,
             CASE WHEN len(h) >= 4 THEN
               list_distinct(list_transform(range(1, len(h) - 4 + 2),
                                            i -> list_min(h[i : i + 3])))
             ELSE [] END AS fps
      FROM kh
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fps,
           list_min(fps)            AS min_fp,
           list_max(fps)            AS max_fp
    FROM fp
    """,
)
def q73_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): 8-gram rolling hash (Horner base-31, pure integer — bit-
    identical on both engines), min-select over every 4-hash window,
    distinct the selected mins.  All inside per-row higher-order
    expressions: no shuffle at all until a downstream join on
    fingerprints; at 100 TB this is a map-only scan."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.lower(F.col("text")).alias("t"))
        .withColumn(
            "c", F.expr("transform(sequence(1, length(t)), i -> ascii(substr(t, i, 1)))")
        )
        .withColumn(
            "h",
            F.expr(
                "CASE WHEN size(c) >= 8 THEN "
                "  transform(sequence(1, size(c) - 7), "
                "            i -> aggregate(sequence(0, 7), CAST(0 AS BIGINT), "
                "                           (acc, j) -> acc * 31 + element_at(c, i + j))) "
                "ELSE CAST(array() AS ARRAY<BIGINT>) END"
            ),
        )
        .withColumn(
            "fps",
            F.expr(
                "CASE WHEN size(h) >= 4 THEN "
                "  array_distinct(transform(sequence(1, size(h) - 3), "
                "                           i -> array_min(slice(h, i, 4)))) "
                "ELSE CAST(array() AS ARRAY<BIGINT>) END"
            ),
        )
        .select(
            "doc_id",
            F.size("fps").cast("bigint").alias("n_fps"),
            F.array_min("fps").alias("min_fp"),
            F.array_max("fps").alias("max_fp"),
        )
    )


@_register(
    "q74_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, t.term
      FROM documents,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS t(term)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * ((n.n_docs * 1000000) // df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tf, df, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rnk
      FROM scored
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score AS BIGINT) AS score
    FROM ranked WHERE rnk <= 3
    """,
)
def q74_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document by tf-idf with a
    reciprocal (non-log) idf, integer-scaled: score = tf * (N*1e6 // df).
    Pure integer arithmetic keeps the RANKING bit-identical across
    engines (a log idf differs in the last ulp and can flip rank-boundary
    ties).  Shape at scale: tf is one shuffle on (doc, term), df one
    map-side-combined shuffle on term, N a broadcast scalar, the rank a
    WindowGroupLimit top-k — no all-pairs anything."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf rows are unique per (doc, term) already — a plain count is the
    # doc frequency without a distinct-aggregate expand
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # one scalar to the driver: the corpus size
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.expr(f"CAST({n_docs} AS BIGINT) * 1000000 DIV df")).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "doc_id",
            F.col("rnk").cast("bigint").alias("rnk"),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("score").cast("bigint").alias("score"),
        )
    )


@_register(
    "q75_stratified_sample",
    """
    WITH rates AS (
      SELECT * FROM (VALUES ('purchase', 100), ('click', 10), ('view', 5)) AS t(et, rate)
    ),
    sampled AS (
      SELECT e.event_type, e.value
      FROM events e JOIN rates r ON e.event_type = r.et
      WHERE e.event_id % 100 < r.rate
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)   AS n_sampled,
           round(sum(value), 4)       AS sum_value
    FROM sampled GROUP BY event_type
    """,
)
def q75_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates applied via a
    key-hash predicate (event_id % 100 < rate) — the reproducible twin of
    sampleBy(), pushed down to the scan as a cheap filter.  Different
    strata keep 100%/10%/5%; unknown strata drop (inner join against the
    broadcast rate table)."""
    ev = _t(spark, sf_dir, "events")
    rates = _local_df(
        ev.sparkSession,
        [("purchase", 100), ("click", 10), ("view", 5)], "et string, rate int"
    )
    return (
        ev.join(F.broadcast(rates), ev.event_type == rates.et)
        .where(F.col("event_id") % 100 < F.col("rate"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@_register(
    "q76_bigram_vocab",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    bigrams AS (
      SELECT b.bg
      FROM toks,
           unnest(CASE WHEN len(t) >= 2 THEN
                    list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1])
                  ELSE [] END) AS b(bg)
    ),
    counted AS (SELECT bg, count(*) AS n FROM bigrams GROUP BY bg),
    ranked AS (
      SELECT bg, n, row_number() OVER (ORDER BY n DESC, bg) AS rnk FROM counted
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, bg, CAST(n AS BIGINT) AS n
    FROM ranked WHERE rnk <= 20
    """,
)
def q76_bigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram vocabulary: adjacent-token pairs, global counts,
    top-20 — the n-gram statistics pass of a training-data pipeline.
    Map-only bigram construction inside a HOF (no shuffle until the
    count), one map-side-combined aggregation, then a single top-k.  The
    global row_number window is intentionally AFTER the aggregate, on
    |vocab| rows, not |tokens|."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "").alias(
            "t"
        )
    )
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "          i -> concat(element_at(t, i), '_', element_at(t, i + 1)))"
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
        ).alias("bg")
    )
    counted = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("bg"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select(
            F.col("rnk").cast("bigint").alias("rnk"),
            "bg",
            F.col("n").cast("bigint").alias("n"),
        )
    )


@_register(
    "q77_embedding_quantization",
    """
    WITH el AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             unnest(embedding)::DOUBLE         AS val
      FROM embeddings
    ),
    dims AS (
      SELECT pos, min(val) AS mn, max(val) AS mx FROM el GROUP BY pos
    ),
    q AS (
      SELECT el.label,
             least(255, greatest(0,
               floor((el.val - d.mn) * 256.0 / (d.mx - d.mn + 1e-9))))::BIGINT AS code,
             abs(el.val - (d.mn + (least(255, greatest(0,
               floor((el.val - d.mn) * 256.0 / (d.mx - d.mn + 1e-9)))) + 0.5)
               * (d.mx - d.mn + 1e-9) / 256.0)) AS err
      FROM el JOIN dims d USING (pos)
    )
    SELECT label,
           CAST(count(*) AS BIGINT)            AS n_values,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes,
           round(avg(err), 6)                  AS avg_err,
           round(max(err), 6)                  AS max_err
    FROM q GROUP BY label
    """,
)
def q77_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column with per-dimension
    [min, max] codebooks, plus reconstruction-error accounting per label —
    the compression pass before a 100 TB vector corpus ships to training.
    floor() keeps the code assignment bit-exact across engines (round()
    half-up vs half-even diverges at cell boundaries).  Plan shape: one
    64-key dim-stats aggregate, codebook broadcast back, map-side code
    math, one label aggregate — the raw vectors never shuffle."""
    e = _t(spark, sf_dir, "embeddings")
    el = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )
    dims = el.groupBy("pos").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    rng = F.col("mx") - F.col("mn") + F.lit(1e-9)
    code = F.least(
        F.lit(255),
        F.greatest(F.lit(0), F.floor((F.col("val") - F.col("mn")) * 256.0 / rng)),
    ).cast("bigint")
    joined = el.join(F.broadcast(dims), "pos").withColumn("code", code)
    err = F.abs(
        F.col("val") - (F.col("mn") + (F.col("code") + 0.5) * rng / 256.0)
    )
    return (
        joined.withColumn("err", err)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.countDistinct("code").alias("n_codes"),
            F.round(F.avg("err"), 6).alias("avg_err"),
            F.round(F.max("err"), 6).alias("max_err"),
        )
    )


@_register(
    "q78_frame_sample_accounting",
    """
    WITH f AS (
      SELECT doc_id,
             least(8, greatest(1, octet_length(text::BLOB) // 1000)) AS n_frames,
             octet_length(text::BLOB)
               // least(8, greatest(1, octet_length(text::BLOB) // 1000)) AS flen
      FROM documents
    )
    SELECT doc_id                  AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(flen AS BIGINT)     AS frame_len
    FROM f
    """,
)
def q78_frame_sample_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal 1→N plumbing under the driver gate: documents → fake
    'video' payloads → mapInPandas frame sampling (operators/multimodal.py
    sample_frames) → per-media frame accounting.  The oracle recomputes
    the stub's deterministic slicing arithmetic in SQL, so the Arrow
    expansion path (schema, cardinality change, per-frame bytes) is
    hash-verified even though the real codec is stubbed."""
    from stock_ops_spark.operators.multimodal import media_from_text, sample_frames

    d = _t(spark, sf_dir, "documents")
    media = media_from_text(d, "doc_id", "text", "video")
    frames = sample_frames(media, every_ms=1000, max_frames=8)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max(F.octet_length("frame_bytes")).cast("bigint").alias("frame_len"),
    )


@_register(
    "q79_fuzzy_part_names",
    """
    SELECT a.p_brand,
           a.p_partkey                         AS key_a,
           b.p_partkey                         AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def q79_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: within-brand part-name pairs at edit
    distance ≤ 3 — the catalog-reconciliation shape.  Brand equi-join
    blocks the candidate space (never an unblocked product); levenshtein
    runs JVM-side on the blocked pairs only.  For a skew-hot brand the
    same grid_self_pairs decomposition as q36 applies.

    Measured negative results worth keeping (sf0.1, 8M blocked pairs):
    length-band join keys prune only 3% (name lengths are homogeneous);
    a char-frequency L1 prefilter (ed >= L1/2) loses outright — as an
    array HOF it is 4x slower than just running levenshtein, and even
    bit-packed into two longs of 6-bit counts (codegen'd shift/mask
    arithmetic) it still adds more than the bounded-DP levenshtein
    (O(n·k), ~0.5 us/pair at n~13) saves.  The plain blocked form IS the
    optimum here; prefilters only pay at much longer strings."""
    p = _t(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_name")
    a = p.select(
        "p_brand", F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a")
    )
    b = p.select(
        "p_brand", F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b")
    )
    # bounded variant: banded DP early-exits past the threshold (O(n·k)
    # per pair instead of O(n·m)); returns -1 when the distance exceeds
    # it, else the true distance — measured ~25% faster than the plain
    # form on the blocked pair set
    dist = F.expr("levenshtein(name_a, name_b, 3)")
    return (
        a.join(b, "p_brand")
        .where(F.col("key_a") < F.col("key_b"))
        .where(dist >= 0)
        .select("p_brand", "key_a", "key_b", dist.cast("bigint").alias("dist"))
    )


@_register(
    "q80_median_mode_orders",
    """
    WITH cents AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
             strftime(o_orderdate, '%Y-%m') AS om
      FROM orders
    ),
    med AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT)                  AS n_orders,
             round(quantile_cont(pc, 0.5) / 100.0, 4)  AS median_price
      FROM cents GROUP BY o_orderpriority
    ),
    mcount AS (
      SELECT o_orderpriority, om, count(*) AS c FROM cents GROUP BY 1, 2
    ),
    modal AS (
      SELECT o_orderpriority, om AS modal_month, c AS modal_count,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY c DESC, om) AS rn
      FROM mcount
    )
    SELECT m.o_orderpriority, m.n_orders, m.median_price,
           d.modal_month, CAST(d.modal_count AS BIGINT) AS modal_count
    FROM med m JOIN modal d
      ON m.o_orderpriority = d.o_orderpriority AND d.rn = 1
    """,
)
def q80_median_mode_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated percentile over integer cents — the
    interpolation arithmetic is identical IEEE ops on both engines) and
    deterministic mode (ranked counts with an explicit count-desc,
    value-asc tiebreak; engine-native mode() has unspecified ties)."""
    o = _t(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("pc"),
        F.date_format("o_orderdate", "yyyy-MM").alias("om"),
    )
    med = cents.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(pc, 0.5)") / 100.0, 4).alias("median_price"),
    )
    mcount = cents.groupBy("o_orderpriority", "om").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("c").desc(), F.col("om"))
    modal = (
        mcount.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("om").alias("modal_month"),
            F.col("c").cast("bigint").alias("modal_count"),
        )
    )
    return med.join(modal, "o_orderpriority")


@_register(
    "q81_within_cluster_knn",
    """
    WITH q AS (
      SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
      FROM embeddings e JOIN q
        ON e.label = q.label AND e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, c,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY c DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, round(c, 6) AS cos_sim
    FROM ranked WHERE rn = 1
    """,
)
def q81_within_cluster_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked k-NN join at scale: a 2% query sample meets the corpus
    through a cluster-id EQUI-join (each query searches its own cell) —
    the knn_join_ivf shape with self-label routing, which makes the
    result exactly SQL-expressible.  Per-query top-1 via ranking window
    (WindowGroupLimit).

    Scale note (r9, per advice): the query side is a FIXED FRACTION
    (2%) of the corpus, so it grows linearly with the corpus — a forced
    broadcast would eventually OOM the driver at the 100 TB posture.
    No broadcast hint: AQE picks broadcast while the sample fits
    (it does at every tested SF) and degrades to a shuffled equi-join
    gracefully beyond that.  A production batch-kNN with a genuinely
    bounded query set should keep the hint (see knn_join_ivf, where
    the query batch is bounded by contract).

    PERF (r8, the q311 lesson): norms fold ONCE PER VECTOR on each side
    BEFORE the pair join — V.cosine inside the join re-folds the corpus
    norm per query and the query norm per corpus row.  dot/(ne·nq) is
    the identical double (same fold, same sqrt, same grouping), so the
    rounded oracle value is unchanged.  Measured at sf1: 30.9 s →
    12.5 s (2.5×) for norms-out-of-the-join + broadcast together.

    PERF (r10): in-cell scoring via the blocked numpy kernel
    (``similarity.knn_join_blocked`` — the q322 discipline with
    self-label cells): per-label query matrices broadcast once, one
    float64 Gram matmul per (Arrow batch × label), batch-local top-k
    with ties kept.  Exactness per the kernel's documented argument;
    the blocked==hof parity test covers the label-cell path.  The 2%
    query sample is driver-collected here (the q311 fixed-fraction
    caveat, noted on the kernel): bounded at every tested SF; a
    100 TB run would bound the sample or fall back to the pure
    equi-join shape this replaces.  Measured at sf1 (regenerated
    corpus): 17.4 s in-record → 2.1 s dedicated min-of-2 (~8×),
    oracle hash unchanged."""
    e = _t(spark, sf_dir, "embeddings")
    from stock_ops_spark.operators.similarity import knn_join_blocked

    q = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        "label",
        F.col("embedding").alias("qv"),
    )
    out = knn_join_blocked(e, q, k=1, cluster_col="label")
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim")
    )


@_register(
    "q82_multiset_except_all",
    """
    WITH rem AS (
      SELECT l_orderkey FROM lineitem
      EXCEPT ALL
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_kept
    FROM rem GROUP BY l_orderkey
    """,
)
def q82_multiset_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) difference — exceptAll: per order, the lineitem
    multiplicity that survives after removing the returned ones.
    Multiset semantics (duplicates subtract one-for-one) are exactly what
    distinct-based EXCEPT cannot express."""
    li = _t(spark, sf_dir, "lineitem")
    all_items = li.select("l_orderkey")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        all_items.exceptAll(returned)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@_register(
    "q83_multiset_intersect_all",
    """
    WITH paired AS (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_paired
    FROM paired GROUP BY user_id
    """,
)
def q83_multiset_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection — intersectAll: per user the min(clicks,
    purchases) multiplicity, i.e. how many purchases can be 1:1-paired
    with clicks.  The multiset twin of q48's distinct set ops."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id")
    return (
        clicks.intersectAll(purchases)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_paired"))
    )


@_register(
    "q84_trailing_hour_purchases",
    """
    WITH p AS (
      SELECT event_id, user_id, epoch_ms(ts) AS tms, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
           round(sum(value) OVER w, 4)     AS sum_trailing_1h
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY tms
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """,
)
def q84_trailing_hour_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: per user, the purchase count and
    value over the trailing hour of EVENT TIME — unlike ROWS frames
    (q28), the frame width varies with timestamp density, and peer rows
    (same tms) enter the frame together, which both engines define
    identically."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_millis("ts").alias("tms"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tms")
        .rangeBetween(-3_600_000, 0)
    )
    return p.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_trailing_1h"),
    )


@_register(
    "q85_grouping_sets_sql",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
                                       AS gid,
           CAST(count(*) AS BIGINT)    AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q85_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the raw SQL surface (the engine's
    spark.sql path over registered views — same Catalyst plan as the
    DataFrame API): two one-dimension marginals plus the grand total,
    disambiguated by grouping() bits.  Complements rollup (q53) and cube
    (q29)."""
    o = _t(spark, sf_dir, "orders")
    view = "orders_q85"
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
                                           AS gid,
               CAST(count(*) AS BIGINT)    AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@_register(
    "q86_joint_dedup_consensus",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
                                          i -> substr(lower(text), i, 8))) AS s
      FROM documents
    ),
    tp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
               / (len(a.s) + len(b.s)
                  - len(list_filter(a.s, x -> list_contains(b.s, x)))) AS j
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
            / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    )
    SELECT tp.id_a, tp.id_b,
           round(tp.j, 6) AS jaccard,
           round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                        eb.embedding::DOUBLE[]), 6) AS cos_sim,
           CAST(list_cosine_similarity(ea.embedding::DOUBLE[],
                                       eb.embedding::DOUBLE[]) >= 0.99 AS BIGINT)
                          AS vector_agrees
    FROM tp
    JOIN embeddings ea ON ea.vec_id = tp.id_a
    JOIN embeddings eb ON eb.vec_id = tp.id_b
    """,
)
def q86_joint_dedup_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint text+vector dedup: every text near-dup candidate pair (the
    q21 minhash-LSH pipeline) is scored against the documents' embedding
    cosine — agreement between independent modalities is the precision
    filter a production dedup pipeline applies before destructive
    deletion.  The pair set is usually LSH-small and AQE will pick a
    broadcast join on its actual runtime size; no forced hint — a
    high-duplication corpus at 100 TB can make the pair set outgrow
    any broadcast budget, and a forced hint would then OOM the driver
    where AQE degrades gracefully to a shuffled join."""
    e = _t(spark, sf_dir, "embeddings")
    pairs = _neardup_pairs(spark, sf_dir).select(
        "id_a", "id_b", F.col("jaccard").alias("j")
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    cs = V.cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        pairs
        .join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("j", 6).alias("jaccard"),
            F.round(cs, 6).alias("cos_sim"),
            (cs >= 0.99).cast("bigint").alias("vector_agrees"),
        )
    )
