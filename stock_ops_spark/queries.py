"""The engine's query library — driver-contract surface.

Each entry is a pair: a PySpark DataFrame program and a DuckDB-runnable
ANSI-SQL twin producing the identical result (row count, column names,
values).  Conventions that make the hash comparison robust:

- every computed column is explicitly aliased, identically on both sides
- integer outputs are cast to BIGINT on both sides (DuckDB ``sum(BIGINT)``
  is HUGEINT, Spark ``size()`` is INT — both normalized)
- floating aggregates are rounded (2–6 dp) AFTER ordering decisions
- dates/timestamps are emitted as formatted strings
- top-k orderings always carry a unique tiebreak column

Operator IDs in docstrings refer to SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_ops_spark import catalog
from stock_ops_spark.functions import text as TXT
from stock_ops_spark.functions import vector as V
from stock_ops_spark.operators.asof import asof_join_nearest
from stock_ops_spark.operators.ohlc import session_ohlc
from stock_ops_spark.operators.versioning import latest_version_view

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load(spark, sf_dir, name)


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
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
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
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
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
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)      AS revenue
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
            F.round("__rev", 2).alias("revenue"),
        )
    )


@_register(
    "q05_region_revenue",
    """
    SELECT r.r_name                                              AS region,
           n.n_name                                              AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
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
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "q06_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
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
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
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
