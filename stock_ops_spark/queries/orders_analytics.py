"""Order/customer analytics breadth: payments, rank profiles, lifecycle, decontamination-era additions (q174-q230).

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



@_register(
    "q174_duplicate_payments",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice / 100) AS BIGINT) AS bucket,
             o_orderdate
      FROM orders
    )
    SELECT CAST(a.o_custkey AS BIGINT)  AS custkey,
           CAST(a.o_orderkey AS BIGINT) AS order_a,
           CAST(b.o_orderkey AS BIGINT) AS order_b,
           CAST(a.bucket AS BIGINT)     AS amount_bucket,
           CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
               AS days_apart
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.bucket = b.bucket
     AND a.o_orderkey < b.o_orderkey
     AND b.o_orderdate BETWEEN a.o_orderdate - INTERVAL 365 DAY
                           AND a.o_orderdate + INTERVAL 365 DAY
    ORDER BY custkey, order_a, order_b
    """,
)
def q174_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment suspects: same customer, amount in the same
    $100 bucket, within a year — the accounts-payable audit
    (structured-record near-dup, complementing the text dedup family).
    Scale shape: the self-join BLOCKS on (custkey, amount bucket) — an
    equi-join whose block sizes stay tiny (a customer rarely repeats a
    price bucket), so the quadratic explosion a date-only band join
    would cause never happens; the ±365-day band is a residual
    predicate inside each block.  Integer bucket equality avoids the
    float-compare trap."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") / 100).cast("bigint").alias("bucket"),
        "o_orderdate",
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (
                F.col("b.o_orderdate")
                >= F.col("a.o_orderdate") - F.expr("INTERVAL 365 DAYS")
            )
            & (
                F.col("b.o_orderdate")
                <= F.col("a.o_orderdate") + F.expr("INTERVAL 365 DAYS")
            ),
        )
        .select(
            F.col("a.o_custkey").cast("bigint").alias("custkey"),
            F.col("a.o_orderkey").cast("bigint").alias("order_a"),
            F.col("b.o_orderkey").cast("bigint").alias("order_b"),
            F.col("a.bucket").cast("bigint").alias("amount_bucket"),
            F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))
            .cast("bigint")
            .alias("days_apart"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


@_register(
    "q175_revenue_by_order_index",
    """
    WITH seq AS (
      SELECT o_custkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS idx,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    )
    SELECT CAST(idx AS BIGINT)      AS order_index,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c)::DOUBLE / count(*) / 100, 6) AS avg_order_value,
           round(sum(c)::DOUBLE / 100, 2)            AS total_revenue
    FROM seq WHERE idx <= 10
    GROUP BY idx
    """,
)
def q175_revenue_by_order_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order sequence number: average order value for each
    customer's 1st, 2nd, ... 10th order — the LTV growth-curve input
    ('do repeat orders get bigger?').  Scale shape: one shuffle
    (partition by customer) for the row_number, the idx<=10 filter
    rewrites to WindowGroupLimit (per-group top-10 pre-prune), then a
    10-key aggregate.  Averages are ratios of exact cent sums."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select("c", F.row_number().over(w).alias("idx")).where(
        F.col("idx") <= 10
    )
    return seq.groupBy("idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("c") / F.count(F.lit(1)) / 100, 6).alias("avg_order_value"),
        F.round(F.sum("c") / 100, 2).alias("total_revenue"),
    ).select(
        F.col("idx").cast("bigint").alias("order_index"),
        "n_customers",
        "avg_order_value",
        "total_revenue",
    )


@_register(
    "q176_hierarchy_share",
    """
    WITH nat AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rc
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY n.n_name, r.r_name
    ),
    reg AS (SELECT region, sum(rc) AS reg_rc FROM nat GROUP BY region),
    tot AS (SELECT sum(rc) AS t FROM nat)
    SELECT nat.region                       AS region,
           nat.nation                       AS nation,
           round(nat.rc::DOUBLE / 100, 2)   AS revenue,
           round(nat.rc::DOUBLE / reg.reg_rc, 6) AS share_of_region,
           round(reg.reg_rc::DOUBLE / tot.t, 6)  AS region_share_of_total
    FROM nat JOIN reg ON reg.region = nat.region CROSS JOIN tot
    ORDER BY region, nation
    """,
)
def q176_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent report: nation revenue as a share of
    its region, region as a share of world — the drill-down
    navigation every BI layer generates (share-of-parent at each
    level).  Scale shape: dims broadcast onto ONE fact pass; the
    nation-level rollup (~25 rows) then self-aggregates to region and
    total in-memory, so the three levels cost one shuffle.  All
    shares are ratios of exact cent integers."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "rc"
            )
        )
    )
    reg = nat.groupBy("region").agg(F.sum("rc").alias("reg_rc"))
    tot = nat.agg(F.sum("rc").alias("t"))
    return (
        nat.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.round(F.col("rc") / 100, 2).alias("revenue"),
            F.round(F.col("rc") / F.col("reg_rc"), 6).alias("share_of_region"),
            F.round(F.col("reg_rc") / F.col("t"), 6).alias(
                "region_share_of_total"
            ),
        )
        .orderBy("region", "nation")
    )


@_register(
    "q177_exact_corr_matrix",
    """
    WITH x AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
             CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
    ),
    s AS (
      SELECT count(*) AS n,
             sum(q) AS sq, sum(p) AS sp, sum(d) AS sd,
             sum(q * q) AS sqq, sum(p * p) AS spp, sum(d * d) AS sdd,
             sum(q * p) AS sqp, sum(q * d) AS sqd, sum(p * d) AS spd
      FROM x
    )
    SELECT 'quantity~price' AS pair,
           round((n * sqp - sq * sp)
                 / sqrt((n * sqq - sq * sq)::DOUBLE * (n * spp - sp * sp)), 6)
               + 0.0 AS pearson_r,
           round((n * sqp - sq * sp)::DOUBLE / (n * spp - sp * sp), 6)
               + 0.0 AS slope_on_second,
           CAST(n AS BIGINT) AS n
    FROM s
    UNION ALL
    SELECT 'quantity~discount',
           round((n * sqd - sq * sd)
                 / sqrt((n * sqq - sq * sq)::DOUBLE * (n * sdd - sd * sd)), 6)
               + 0.0,
           round((n * sqd - sq * sd)::DOUBLE / (n * sdd - sd * sd), 6) + 0.0,
           CAST(n AS BIGINT)
    FROM s
    UNION ALL
    SELECT 'price~discount',
           round((n * spd - sp * sd)
                 / sqrt((n * spp - sp * sp)::DOUBLE * (n * sdd - sd * sd)), 6)
               + 0.0,
           round((n * spd - sp * sd)::DOUBLE / (n * sdd - sd * sd), 6) + 0.0,
           CAST(n AS BIGINT)
    FROM s
    """,
)
def q177_exact_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope matrix over lineitem measures,
    computed from EXACT integer moment sums (n, Σx, Σxy, Σx² as
    bigints) rather than the built-in corr()/regr_slope() — those
    accumulate doubles in partition order and are unhashable across
    engines; the closed-form over exact integers is bit-identical.
    One scan, one 10-sum aggregate (map-side combinable), a 1-row
    frame fanned to 3 pairs for free.  The moment sums stay int64
    (Σxy ≤ 3e14 at sf0.1) but their COMBINATION (n·Σxy ~ 1e20)
    overflows long — it runs in DECIMAL(38,0), Spark's twin of
    DuckDB's automatic HUGEINT widening."""
    x = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("p"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("d"),
    )
    # second-moment sums overflow int64 at sf0.1 (Σp² ~ 6e19): the
    # products stay exact in long, the ACCUMULATION runs in
    # decimal(38,0) — DuckDB reaches the same numbers via automatic
    # HUGEINT sum widening
    dprod = lambda a, b: F.sum(  # noqa: E731
        (F.col(a) * F.col(b)).cast("decimal(38,0)")
    )
    s = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        dprod("q", "q").alias("sqq"),
        dprod("p", "p").alias("spp"),
        dprod("d", "d").alias("sdd"),
        dprod("q", "p").alias("sqp"),
        dprod("q", "d").alias("sqd"),
        dprod("p", "d").alias("spd"),
    )

    def row(label, sxy, sx, sy, sxx, syy):
        # n*Σxy reaches ~1e20 at sf0.1 — combine moments in decimal(38,0)
        # (the Spark twin of DuckDB's automatic HUGEINT sums), drop to
        # double only for the final ratios
        dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
        n = dec("n")
        cov = (n * dec(sxy) - dec(sx) * dec(sy)).cast("double")
        vx = (n * dec(sxx) - dec(sx) * dec(sx)).cast("double")
        vy = (n * dec(syy) - dec(sy) * dec(sy)).cast("double")
        return F.struct(
            F.lit(label).alias("pair"),
            # + 0.0 normalizes IEEE negative zero (round(-1e-9, 6) is
            # -0.0 in DuckDB, 0.0 in Spark — they format differently)
            (F.round(cov / F.sqrt(vx * vy), 6) + 0.0).alias("pearson_r"),
            (F.round(cov / vy, 6) + 0.0).alias("slope_on_second"),
            F.col("n").cast("bigint").alias("n"),
        )

    return s.select(
        F.explode(
            F.array(
                row("quantity~price", "sqp", "sq", "sp", "sqq", "spp"),
                row("quantity~discount", "sqd", "sq", "sd", "sqq", "sdd"),
                row("price~discount", "spd", "sp", "sd", "spp", "sdd"),
            )
        ).alias("r")
    ).select("r.*")


@_register(
    "q178_bounce_rate",
    """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts)
                       - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    s AS (
      SELECT user_id, event_type, is_start,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS sess
      FROM e
    ),
    per AS (
      SELECT user_id, sess,
             count(*) AS n_events,
             max(CASE WHEN is_start = 1 THEN event_type END) AS entry_type
      FROM s GROUP BY user_id, sess
    )
    SELECT entry_type                                         AS entry_type,
           CAST(count(*) AS BIGINT)                           AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6)                               AS bounce_rate,
           round(avg(n_events), 6)                            AS avg_session_len
    FROM per GROUP BY entry_type
    """,
)
def q178_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce-rate report by session entry event: 30-minute-gap
    sessionization (gaps-and-islands via cumulative session-start
    markers), then per-entry-type share of single-event sessions —
    the engagement-quality metric next to q33's session stats.  Scale
    shape: ONE shuffle (partition by user) feeds the gap lag, the
    session-id running sum and the per-session aggregate (the
    session's unique is_start row carries the entry type — no second
    ordered pass); the entry-type rollup is a
    5-key agg.  Rates are ratios of exact counts."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_start = (
        prev.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev)) > 1_800_000_000)
    ).cast("int")
    s = ev.withColumn("is_start", is_start).withColumn(
        "sess",
        F.sum("is_start").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        # the session's single is_start row IS the entry event — a
        # conditional max avoids a second ordered pass
        F.max(F.when(F.col("is_start") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
    )
    return per.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
        F.round(F.avg("n_events"), 6).alias("avg_session_len"),
    )


@_register(
    "q179_abc_classification",
    """
    WITH pr AS (
      SELECT l_partkey AS part,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rc
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(rc) AS t FROM pr),
    cum AS (
      SELECT part, rc,
             sum(rc) OVER (ORDER BY rc DESC, part) AS crc
      FROM pr
    ),
    cls AS (
      SELECT part, rc,
             CASE WHEN crc * 100 <= 80 * tot.t THEN 'A'
                  WHEN crc * 100 <= 95 * tot.t THEN 'B'
                  ELSE 'C' END AS abc
      FROM cum CROSS JOIN tot
    )
    SELECT abc                                  AS abc_class,
           CAST(count(*) AS BIGINT)             AS n_parts,
           round(sum(rc)::DOUBLE / 100, 2)      AS revenue,
           round(sum(rc)::DOUBLE / tot.t, 6)    AS revenue_share
    FROM cls CROSS JOIN tot
    GROUP BY abc, tot.t
    """,
)
def q179_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A =
    the head covering 80% of cumulative revenue, B to 95%, C the tail —
    the warehouse-prioritization standard.  The global cumulative sum
    over the ranked part frame reuses `prefix_sum_chunked` with
    revenue-band buckets (within-band cumsum in parallel + broadcast
    band offsets), so no window ever orders the full part dimension in
    one task — at 100 TB the part frame is itself millions of rows and
    a bare Window.orderBy would serialize it.  Class cuts compare
    exact integers (crc·100 ≤ 80·total — no float thresholds)."""
    from stock_ops_spark.operators.timeseries import prefix_sum_chunked

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pr = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias(
            "rc"
        )
    )
    # order key: revenue DESC with part tiebreak → ascending (-rc, part);
    # bucket = coarse band of -rc (non-decreasing along the order)
    ranked = pr.withColumn("__ord", -F.col("rc"))
    cum = prefix_sum_chunked(
        ranked, "__ord", "rc", F.floor(F.col("__ord") / 1_000_000), "part"
    )
    tot = pr.agg(F.sum("rc").alias("t"))
    cls = cum.crossJoin(F.broadcast(tot)).select(
        "rc",
        "t",
        F.when(F.col("__cum") * 100 <= 80 * F.col("t"), "A")
        .when(F.col("__cum") * 100 <= 95 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    return cls.groupBy("abc", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("rc") / 100, 2).alias("revenue"),
        F.round(F.sum("rc") / F.col("t"), 6).alias("revenue_share"),
    ).select(
        F.col("abc").alias("abc_class"), "n_parts", "revenue", "revenue_share"
    )


@_register(
    "q180_watermark_estimator",
    """
    WITH arr AS (
      SELECT event_id, ts,
             max(ts) OVER (ORDER BY event_id) AS high_water
      FROM events
    ),
    late AS (
      SELECT (epoch_us(high_water) - epoch_us(ts)) AS late_us FROM arr
    )
    SELECT CAST(count(*) AS BIGINT)                          AS n_events,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           round(quantile_cont(late_us, 0.5) / 1000000, 6)   AS p50_late_s,
           round(quantile_cont(late_us, 0.95) / 1000000, 6)  AS p95_late_s,
           round(quantile_cont(late_us, 0.99) / 1000000, 6)  AS p99_late_s,
           round(max(late_us)::DOUBLE / 1000000, 6)          AS max_late_s
    FROM late
    """,
)
def q180_watermark_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay estimator: treating event_id as arrival order,
    each event's lateness is (event-time high-water-mark so far − its
    own event time); the p95/p99 of that distribution IS the watermark
    a streaming job should configure (ST2's 'late data never dropped'
    bound, measured instead of guessed).  The running max over arrival
    order uses the same two-pass chunked decomposition as
    prefix_sum_chunked / max_drawdown_chunked: within-bucket running
    max (parallel) + exclusive prefix over per-bucket maxima
    (broadcast) — max is associative, so the composition is exact and
    no window orders the full stream in one task.  Lateness values are
    exact integer micros; quantiles interpolate exactly."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("tus")
    )
    b = ev.withColumn("__b", F.floor(F.col("event_id") / 1024))
    w_in = (
        Window.partitionBy("__b")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = b.withColumn("__local_hw", F.max("tus").over(w_in))
    bmax = b.groupBy("__b").agg(F.max("tus").alias("__bmax"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prior = bmax.select("__b", F.max("__bmax").over(w_b).alias("__prior"))
    late = (
        within.join(F.broadcast(prior), "__b")
        .select(
            (
                F.greatest(
                    F.col("__local_hw"),
                    F.coalesce(F.col("__prior"), F.col("__local_hw")),
                )
                - F.col("tus")
            ).alias("late_us")
        )
    )
    return late.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.round(F.expr("percentile(late_us, 0.5)") / 1000000, 6).alias(
            "p50_late_s"
        ),
        F.round(F.expr("percentile(late_us, 0.95)") / 1000000, 6).alias(
            "p95_late_s"
        ),
        F.round(F.expr("percentile(late_us, 0.99)") / 1000000, 6).alias(
            "p99_late_s"
        ),
        F.round(F.max("late_us") / 1000000, 6).alias("max_late_s"),
    )


@_register(
    "q181_state_size_profile",
    """
    WITH w AS (
      SELECT date_trunc('hour', ts) AS h,
             count(DISTINCT user_id) AS n_keys,
             count(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT)        AS n_windows,
           CAST(max(n_keys) AS BIGINT)     AS max_keys_per_window,
           round(avg(n_keys), 6)           AS avg_keys_per_window,
           CAST(max(n_events) AS BIGINT)   AS max_events_per_window,
           round(avg(n_events), 6)         AS avg_events_per_window,
           CAST(sum(n_keys) AS BIGINT)     AS key_window_pairs
    FROM w
    """,
)
def q181_state_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming state-sizing profile: per 1-hour tumbling window, how
    many distinct keys (users) and events a stateful operator would
    hold — max/avg across windows is the number that sizes RocksDB
    state stores and shuffle partitions BEFORE deploying the stream
    (ST4's capacity-planning input, measured from history).  Scale
    shape: one aggregation keyed by the window bucket with a distinct
    count inside (HLL at 100 TB per q43), then a scalar rollup over
    the ~720-windows/month frame.  Averages are ratios of exact
    integers."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    w = ev.groupBy("h").agg(
        F.countDistinct("user_id").alias("n_keys"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.max("n_keys").cast("bigint").alias("max_keys_per_window"),
        F.round(F.avg("n_keys"), 6).alias("avg_keys_per_window"),
        F.max("n_events").cast("bigint").alias("max_events_per_window"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_window"),
        F.sum("n_keys").cast("bigint").alias("key_window_pairs"),
    )


@_register(
    "q182_new_vs_returning",
    """
    WITH fo AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS fm
      FROM orders GROUP BY o_custkey
    ),
    m AS (
      SELECT date_trunc('month', o.o_orderdate) AS mth,
             CASE WHEN date_trunc('month', o.o_orderdate) = fo.fm
                  THEN 'new' ELSE 'returning' END AS kind,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS c
      FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
    ),
    agg AS (
      SELECT mth, kind, count(*) AS n, sum(c) AS rc FROM m GROUP BY mth, kind
    ),
    tot AS (SELECT mth, sum(rc) AS mrc FROM agg GROUP BY mth)
    SELECT strftime(agg.mth, '%Y-%m')        AS month,
           agg.kind                          AS kind,
           CAST(agg.n AS BIGINT)             AS n_orders,
           round(agg.rc::DOUBLE / 100, 2)    AS revenue,
           round(agg.rc::DOUBLE / tot.mrc, 6) AS share_of_month
    FROM agg JOIN tot ON tot.mth = agg.mth
    ORDER BY month, kind
    """,
)
def q182_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning revenue mix per month: an order is 'new' when it
    falls in its customer's first-ever month — the acquisition-vs-
    retention revenue split every growth dashboard leads with.  Scale
    shape: the first-month frame shares the o_custkey shuffle with the
    classification join (co-partitioned, same key as q144's cohort
    build), the month×kind rollup is tiny, and month totals join back
    broadcast.  Shares are ratios of exact cent integers."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.trunc("o_orderdate", "month").alias("mth"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    fo = o.groupBy("o_custkey").agg(F.min("mth").alias("fm"))
    m = o.join(fo, "o_custkey").select(
        "mth",
        F.when(F.col("mth") == F.col("fm"), "new").otherwise("returning").alias(
            "kind"
        ),
        "c",
    )
    agg = m.groupBy("mth", "kind").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("rc")
    )
    tot = agg.groupBy("mth").agg(F.sum("rc").alias("mrc"))
    return (
        agg.join(F.broadcast(tot), "mth")
        .select(
            F.date_format("mth", "yyyy-MM").alias("month"),
            "kind",
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(F.col("rc") / 100, 2).alias("revenue"),
            F.round(F.col("rc") / F.col("mrc"), 6).alias("share_of_month"),
        )
        .orderBy("month", "kind")
    )


@_register(
    "q183_bpe_merge_candidates",
    """
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, count(*) AS n FROM words WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, sum(n) AS n_occ
      FROM wc CROSS JOIN LATERAL
           unnest(generate_series(1, length(w) - 1)) AS u(i)
      GROUP BY substr(w, i, 2)
    )
    SELECT pair                     AS pair,
           CAST(n_occ AS BIGINT)    AS n_occurrences
    FROM pairs
    ORDER BY n_occ DESC, pair LIMIT 20
    """,
)
def q183_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE iteration: the 20 most frequent adjacent character
    pairs across the corpus — the merge-candidate ranking a
    byte-pair-encoding tokenizer trainer computes each round.  Scale
    shape: the corpus token stream collapses to the WORD VOCABULARY
    with counts first (the classic BPE trick — pair counts weight by
    word frequency, so the pair scan touches ~10^4 vocab entries, not
    10^9 running words), then pairs explode from the tiny vocab frame.
    Both sides enumerate positions 1..length(w)-1 with NO length cap
    (the oracle's lateral generate_series mirrors Spark's
    sequence(1, length-1) exactly — a fixed cap would silently
    diverge on 41+-char tokens).  Two aggregations, both map-side
    combinable; counts exact."""
    d = _t(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        wc.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"
                )
            ).alias("pair"),
            "n",
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("n_occ"))
    )
    return (
        pairs.orderBy(F.col("n_occ").desc(), "pair")
        .limit(20)
        .select("pair", F.col("n_occ").cast("bigint").alias("n_occurrences"))
    )


@_register(
    "q184_salted_flag_rollup",
    """
    SELECT l_returnflag                          AS returnflag,
           CAST(count(*) AS BIGINT)              AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))::DOUBLE
                 / 100, 2)                       AS revenue,
           CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS max_price_c
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q184_salted_flag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation through operators/skew.py::salted_agg: the
    3-value l_returnflag key is the textbook hot-key shape (600k rows
    / 3 groups → 3 reducers do all the work in a naive plan).  The
    salted two-phase form spreads each key over 16 deterministic salt
    buckets (xxhash64 of the row, never rand() — replay-stable),
    partial-aggregates per (key, salt), then merges the 48-row partial
    frame — identical results, 16× the reduce parallelism.  (Spark's
    map-side partial aggregation usually hides this for algebraic
    aggs; salting is the insurance for high-cardinality-accumulator
    aggs and AQE-resistant skew.)  Result equals the plain GROUP BY,
    which is exactly what the oracle pins."""
    from stock_ops_spark.operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("pc"),
    )
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n_items": (F.count(F.lit(1)), F.sum("n_items")),
            "total_qty": (F.sum("qty"), F.sum("total_qty")),
            "rev_c": (F.sum("pc"), F.sum("rev_c")),
            "max_price_c": (F.max("pc"), F.max("max_price_c")),
        },
        buckets=16,
    )
    return out.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("total_qty").cast("bigint").alias("total_qty"),
        F.round(F.col("rev_c") / 100, 2).alias("revenue"),
        F.col("max_price_c").cast("bigint").alias("max_price_c"),
    )


@_register(
    "q185_returned_items_report",
    """
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
           c.c_name                    AS c_name,
           n.n_name                    AS nation,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                          AS BIGINT))::DOUBLE / 10000, 4) AS lost_revenue,
           CAST(count(*) AS BIGINT)    AS n_returned_items
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                            AS BIGINT))::DOUBLE / 10000, 4) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q185_returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items, with nation — the churn-risk account list.  Scale shape:
    the returnflag filter prunes at the lineitem scan, the
    lineitem⋈orders key join is the ONE fact shuffle, customer and
    nation broadcast onto the aggregated frame, and the top-20 plans
    as TakeOrderedAndProject.  Revenue is exact at 4 decimals
    (2dp price × 2dp discount factor), summed as integer
    ten-thousandths — the q01 discipline."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("bigint")
        .alias("rev4"),
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum("rev4").alias("rev4"),
            F.count(F.lit(1)).alias("n_ret"),
        )
    )
    return (
        agg.join(F.broadcast(c), agg.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("rev4") / 10000, 4).alias("lost_revenue"),
            F.col("n_ret").cast("bigint").alias("n_returned_items"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "q186_ks_test",
    """
    WITH p AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 'B' ELSE 'A' END AS grp
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
    ),
    vc AS (
      SELECT v,
             sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS cb
      FROM p GROUP BY v
    ),
    n AS (
      SELECT sum(ca) AS na, sum(cb) AS nb FROM vc
    ),
    cum AS (
      SELECT sum(ca) OVER (ORDER BY v) AS cuma,
             sum(cb) OVER (ORDER BY v) AS cumb
      FROM vc
    ),
    d AS (
      SELECT max(abs(cuma * n.nb - cumb * n.na)) AS dnum
      FROM cum CROSS JOIN n
    )
    SELECT CAST(n.na AS BIGINT) AS n_weekday,
           CAST(n.nb AS BIGINT) AS n_weekend,
           round(d.dnum::DOUBLE / (n.na * n.nb), 6) AS ks_d,
           round(1.358 * sqrt((n.na + n.nb)::DOUBLE / (n.na * n.nb)), 6)
               AS crit_05,
           CAST(CASE WHEN d.dnum::DOUBLE / (n.na * n.nb)
                          > 1.358 * sqrt((n.na + n.nb)::DOUBLE / (n.na * n.nb))
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_h0
    FROM d CROSS JOIN n
    """,
)
def q186_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: weekday vs weekend purchase
    value distributions — the distribution-shift detector that catches
    shape changes PSI's fixed bands (q142) smooth over.  Exactness:
    the ECDF difference maximizes |cumA·nB − cumB·nA| over EXACT
    integers (never floating ECDFs), so D is an exact rational; the
    only floats are the final display ratio and the 5% critical value.
    Scale shape: one pass builds per-distinct-value group counts; the
    cumulative window runs over the DOMAIN-bounded distinct-cents
    frame (≤ 49k rows at any corpus size — bounded by the value
    domain, not the row count), then a scalar max."""
    p = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
        F.when(F.dayofweek("ts").isin(1, 7), "B").otherwise("A").alias("grp"),
    )
    vc = p.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("cb"),
    )
    n = vc.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select(
        F.sum("ca").over(w).alias("cuma"), F.sum("cb").over(w).alias("cumb")
    )
    d = (
        cum.crossJoin(F.broadcast(n))
        .agg(
            F.max(
                F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
            ).alias("dnum")
        )
    )
    crit = 1.358 * F.sqrt((F.col("na") + F.col("nb")) / (F.col("na") * F.col("nb")))
    ks = F.col("dnum") / (F.col("na") * F.col("nb"))
    return d.crossJoin(F.broadcast(n)).select(
        F.col("na").cast("bigint").alias("n_weekday"),
        F.col("nb").cast("bigint").alias("n_weekend"),
        F.round(ks, 6).alias("ks_d"),
        F.round(crit, 6).alias("crit_05"),
        F.when(ks > crit, 1).otherwise(0).cast("bigint").alias("reject_h0"),
    )


@_register(
    "q187_cluster_size_histogram",
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
    sizes AS (
      SELECT component, count(*) AS sz FROM comp GROUP BY component
    ),
    tot AS (SELECT count(*) AS n_docs FROM comp)
    SELECT CAST(sz AS BIGINT)          AS cluster_size,
           CAST(count(*) AS BIGINT)    AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           round(sz * count(*)::DOUBLE / tot.n_docs, 6) AS frac_of_corpus
    FROM sizes CROSS JOIN tot
    GROUP BY sz, tot.n_docs
    """,
)
def q187_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: how much of the corpus sits in
    duplicate clusters of each size — the one-line corpus-health
    metric a dedup run reports (size-1 row = unique fraction; a fat
    tail means template spam).  Scale shape: pure consumer of the
    SHARED pair artifact + the same connected-components kernel as
    q70/q125/q131 — the histogram itself is two tiny aggregates on the
    cluster frame.  Fractions are ratios of exact counts."""
    from stock_ops_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs, nodes=d.select("doc_id"))
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    tot = comp.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sizes.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("sz").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
            F.round(
                F.col("sz") * F.col("n_clusters") / F.col("n_docs"), 6
            ).alias("frac_of_corpus"),
        )
    )


@_register(
    "q188_atr_daily",
    """
    WITH e AS (
      SELECT CAST(ts AS DATE) AS d, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
    ),
    closes AS (
      SELECT d, c AS close_c FROM (
        SELECT d, c, row_number() OVER (PARTITION BY d
                                        ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
      ) WHERE rn = 1
    ),
    bars AS (
      SELECT e.d, max(e.c) AS high_c, min(e.c) AS low_c,
             any_value(closes.close_c) AS close_c
      FROM e JOIN closes ON closes.d = e.d
      GROUP BY e.d
    ),
    tr AS (
      SELECT d, high_c, low_c, close_c,
             greatest(high_c - low_c,
                      abs(high_c - lag(close_c) OVER (ORDER BY d)),
                      abs(low_c - lag(close_c) OVER (ORDER BY d))) AS tr_c
      FROM bars
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(tr_c::DOUBLE / 100, 2) AS true_range,
           round(avg(tr_c) OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING
                                 AND CURRENT ROW) / 100, 6) AS atr14
    FROM tr WHERE tr_c IS NOT NULL
    """,
)
def q188_atr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range (14-day) over daily purchase-value bars —
    completes the technical-indicator family (bollinger q87, drawdown
    q88, RSI q89, EWMA q90, VWAP q91, TWAP q149): TR = max(H-L,
    |H-prevC|, |L-prevC|) on exact cents, ATR = 14-bar rolling mean
    (ratio of exact ints).  Scale shape: the heavy pass is the daily
    bar rollup (one agg + one row_number for the close — both on the
    same day partition); the TR/ATR windows run on the tiny daily
    frame.  The close picks by (ts, event_id) DESC — a deterministic
    tiebreak where max_by(value, ts) alone would be ambiguous on
    timestamp collisions."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).select(
        F.to_date("ts").alias("d"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    rn = F.row_number().over(
        Window.partitionBy("d").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    closes = e.withColumn("rn", rn).where(F.col("rn") == 1).select(
        "d", F.col("c").alias("close_c")
    )
    bars = (
        e.groupBy("d")
        .agg(F.max("c").alias("high_c"), F.min("c").alias("low_c"))
        .join(closes, "d")
    )
    w = Window.orderBy("d")
    prev_close = F.lag("close_c").over(w)
    tr_c = F.greatest(
        F.col("high_c") - F.col("low_c"),
        F.abs(F.col("high_c") - prev_close),
        F.abs(F.col("low_c") - prev_close),
    )
    tr = bars.select("d", tr_c.alias("tr_c")).where(F.col("tr_c").isNotNull())
    w14 = Window.orderBy("d").rowsBetween(-13, 0)
    return tr.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(F.col("tr_c") / 100, 2).alias("true_range"),
        F.round(F.avg("tr_c").over(w14) / 100, 6).alias("atr14"),
    )


@_register(
    "q189_erasure_impact",
    """
    WITH targets AS (SELECT unnest([3, 7, 42]) AS uid),
    checks AS (
      SELECT 'events_by_user' AS dataset,
             (SELECT count(*) FROM events e JOIN targets t
              ON e.user_id = t.uid) AS n_rows
      UNION ALL
      SELECT 'customer_rows',
             (SELECT count(*) FROM customer c JOIN targets t
              ON c.c_custkey = t.uid)
      UNION ALL
      SELECT 'orders_by_customer',
             (SELECT count(*) FROM orders o JOIN targets t
              ON o.o_custkey = t.uid)
      UNION ALL
      SELECT 'lineitems_via_orders',
             (SELECT count(*) FROM lineitem l
              WHERE l.l_orderkey IN
                    (SELECT o_orderkey FROM orders o JOIN targets t
                     ON o.o_custkey = t.uid))
    )
    SELECT dataset, CAST(n_rows AS BIGINT) AS n_rows FROM checks
    """,
)
def q189_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-impact audit (GDPR right-to-be-forgotten planning): for a
    target id set, how many rows each dataset holds — directly keyed
    (events, customer, orders) and transitively via the order graph
    (lineitems) — the report that scopes a deletion job before it
    runs.  Scale shape: the target set broadcasts everywhere; the
    transitive check resolves the affected order keys first (itself a
    broadcast join), then semi-probes the fact table — no fact table
    ever shuffles.  At 100 TB the same plan drives the actual delete's
    file-rewrite planning."""
    targets = _local_df(spark, [(3,), (7,), (42,)], "uid long")
    ev = _t(spark, sf_dir, "events")
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    t = F.broadcast(targets)
    n_events = ev.join(t, ev.user_id == targets.uid).count()
    n_cust = cu.join(t, cu.c_custkey == targets.uid).count()
    tgt_orders = o.join(t, o.o_custkey == targets.uid).select("o_orderkey")
    n_orders = tgt_orders.count()
    n_li = li.join(
        F.broadcast(tgt_orders), li.l_orderkey == tgt_orders.o_orderkey, "left_semi"
    ).count()
    rows = [
        ("events_by_user", n_events),
        ("customer_rows", n_cust),
        ("orders_by_customer", n_orders),
        ("lineitems_via_orders", n_li),
    ]
    return _local_df(spark, rows, "dataset string, n_rows long")


@_register(
    "q190_seasonal_residual_anomalies",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CAST(round(value * 100) AS BIGINT)) AS rc
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
      GROUP BY 1
    ),
    dow AS (
      SELECT dayofweek(d) AS w, sum(rc) AS s, count(*) AS n
      FROM daily GROUP BY 1
    )
    SELECT strftime(daily.d, '%Y-%m-%d')       AS day,
           round(daily.rc::DOUBLE / 100, 2)    AS revenue,
           round(dow.s::DOUBLE / dow.n / 100, 6) AS dow_mean,
           round((daily.rc - dow.s::DOUBLE / dow.n) / 100, 6) AS residual
    FROM daily JOIN dow ON dow.w = dayofweek(daily.d)
    ORDER BY abs(daily.rc * dow.n - dow.s) * 1.0 / dow.n DESC, day
    LIMIT 10
    """,
)
def q190_seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly days: the 10 days whose purchase
    revenue deviates most from their OWN day-of-week mean — raw-level
    anomaly detection (q147's rolling z) misfires on weekly
    seasonality; subtracting the weekday profile first is the
    standard correction.  The ordering key |rc·n − s|/n is computed
    from exact integers (never a float mean), so the top-10 is
    hash-stable.  Scale shape: daily rollup (the one real pass), a
    7-row weekday profile broadcast back, top-k."""
    daily = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("rc")
    )
    dow = daily.groupBy((F.dayofweek("d") - 1).alias("w")).agg(
        F.sum("rc").alias("s"), F.count(F.lit(1)).alias("n")
    )
    j = daily.join(F.broadcast(dow), (F.dayofweek(daily.d) - 1) == dow.w)
    order_key = F.abs(F.col("rc") * F.col("n") - F.col("s")) / F.col("n")
    return (
        j.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round(F.col("rc") / 100, 2).alias("revenue"),
            F.round(F.col("s") / F.col("n") / 100, 6).alias("dow_mean"),
            F.round((F.col("rc") - F.col("s") / F.col("n")) / 100, 6).alias(
                "residual"
            ),
            order_key.alias("__k"),
        )
        .orderBy(F.col("__k").desc(), "day")
        .limit(10)
        .drop("__k")
    )


@_register(
    "q191_frequent_triples",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    fp AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING count(*) >= 2
    ),
    tri AS (
      SELECT ab.pa, ab.pb, c.l_partkey AS pc, count(*) AS support
      FROM fp ab
      JOIN op a ON a.l_partkey = ab.pa
      JOIN op b ON b.l_orderkey = a.l_orderkey AND b.l_partkey = ab.pb
      JOIN op c ON c.l_orderkey = a.l_orderkey AND c.l_partkey > ab.pb
      GROUP BY ab.pa, ab.pb, pc HAVING count(*) >= 2
    )
    SELECT CAST(pa AS BIGINT) AS part_a,
           CAST(pb AS BIGINT) AS part_b,
           CAST(pc AS BIGINT) AS part_c,
           CAST(support AS BIGINT) AS support
    FROM tri
    ORDER BY support DESC, part_a, part_b, part_c
    LIMIT 20
    """,
)
def q191_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets (the Apriori step after q137's pairs):
    candidate triples grow ONLY from support>=2 pairs — the
    anti-monotone pruning that makes itemset mining feasible at scale
    (the unpruned triple space is |parts|^3; the pruned one is
    |frequent pairs| x avg order width).  Scale shape: the frequent
    pairs are small (shared co-purchase artifact derivation), each
    joins back to the order-items frame on (order, part) equi-keys,
    and the third item extends within the same order only.  Supports
    exact, full-key tiebreaks."""
    op = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)  # reused 3x in the candidate join
    )
    a, b, c = op.alias("a"), op.alias("b"), op.alias("c")
    fp = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
    )
    tri = (
        fp.join(a, F.col("a.l_partkey") == F.col("pa"))
        .join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") == F.col("pb")),
        )
        .join(
            c,
            (F.col("c.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("c.l_partkey") > F.col("pb")),
        )
        .groupBy("pa", "pb", F.col("c.l_partkey").alias("pc"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
    )
    return (
        tri.select(
            F.col("pa").cast("bigint").alias("part_a"),
            F.col("pb").cast("bigint").alias("part_b"),
            F.col("pc").cast("bigint").alias("part_c"),
            F.col("support").cast("bigint").alias("support"),
        )
        .orderBy(F.col("support").desc(), "part_a", "part_b", "part_c")
        .limit(20)
    )


@_register(
    "q192_hapax_rate",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    tc AS (
      SELECT source, t, count(*) AS n FROM tok WHERE t <> ''
      GROUP BY source, t
    )
    SELECT source,
           CAST(count(*) AS BIGINT)     AS vocab_size,
           CAST(sum(n) AS BIGINT)       AS total_tokens,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6)         AS hapax_rate,
           round(count(*)::DOUBLE / sum(n), 6) AS type_token_ratio
    FROM tc GROUP BY source
    """,
)
def q192_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness profile per source: hapax legomena rate
    (words occurring exactly once — high on organic text, collapses on
    template/boilerplate spam) and type-token ratio — the corpus-mix
    diagnostics next to q130's Zipf slope.  Scale shape: one
    tokenize-explode pass into a (source, word) count (map-side
    combined), then a per-source rollup of that vocabulary frame; the
    raw token stream shuffles once.  All ratios exact-integer."""
    tok = _t(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).where(F.col("t") != "")
    tc = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    return tc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
        F.round(
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("hapax_rate"),
        F.round(F.count(F.lit(1)) / F.sum("n"), 6).alias("type_token_ratio"),
    )


@_register(
    "q193_cross_source_overlap",
    """
    WITH w AS (
      SELECT source, string_split(lower(text), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT DISTINCT source,
             unnest(list_transform(range(1, len(ws) - 3),
                                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                        || ' ' || ws[i+3] || ' ' || ws[i+4]))
                 AS gram
      FROM w WHERE len(ws) >= 5
    ),
    per AS (SELECT source, count(*) AS n_grams FROM g GROUP BY source),
    pair AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS c
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b,
           CAST(c AS BIGINT) AS shared_grams,
           round(c::DOUBLE / (pa.n_grams + pb.n_grams - c), 6) AS jaccard
    FROM pair
    JOIN per pa ON pa.source = src_a
    JOIN per pb ON pb.source = src_b
    ORDER BY c::DOUBLE / (pa.n_grams + pb.n_grams - c) DESC, src_a, src_b
    LIMIT 20
    """,
)
def q193_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: word-5-gram Jaccard overlap
    between every source pair — the leakage screen that catches one
    crawl mirroring another BEFORE both end up in training (q93
    decontaminates against a benchmark; this decontaminates sources
    against each other).  Scale shape: grams dedupe to (source, gram)
    map-side; the pair join is an equi-join ON THE GRAM whose fan-out
    is bounded by sources-per-gram (≤ 20), never a source-pair
    product; per-source totals broadcast onto the 190-row pair frame.
    Jaccard is a ratio of exact counts.

    PERF (r11, VERDICT #7): the distinct (source, 5-gram) set is
    SERVED from the ``source_gram_projection_cached`` artifact —
    derived once per corpus version from the span artifact's
    positioned 4-gram postings (a lead-window reconstruction, no
    re-tokenize; row-identical to the inline pipeline, so the oracle
    hash is unchanged) — leaving only the per-source totals and the
    gram equi-join live per call.  Staleness guard: the projection's
    version digest is the source identity, pinned to the same span
    artifact version it derives from."""
    from stock_ops_spark.operators.spans import source_gram_projection_cached

    g = source_gram_projection_cached(
        _t(spark, sf_dir, "documents"),
        source_path=catalog.table_path(sf_dir, "documents"),
        n=5,
    )
    per = g.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = g.alias("a"), g.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pa = per.select(F.col("source").alias("src_a"), F.col("n_grams").alias("na"))
    pb = per.select(F.col("source").alias("src_b"), F.col("n_grams").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        pair.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("c").cast("bigint").alias("shared_grams"),
            jac.alias("__j"),
        )
        .orderBy(F.col("__j").desc(), "src_a", "src_b")
        .limit(20)
        .select("src_a", "src_b", "shared_grams", F.round("__j", 6).alias("jaccard"))
    )


@_register(
    "q194_churn_label_builder",
    """
    WITH feat AS (
      SELECT user_id,
             count(*) AS n_events,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS n_purchases
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY user_id
    ),
    lbl AS (
      SELECT DISTINCT user_id, 1 AS active
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-29'
    ),
    j AS (
      SELECT least(f.n_events // 10, 5) AS activity_band,
             coalesce(l.active, 0) AS retained
      FROM feat f LEFT JOIN lbl l ON l.user_id = f.user_id
    )
    SELECT CAST(activity_band AS BIGINT) AS activity_band,
           CAST(count(*) AS BIGINT)      AS n_users,
           CAST(sum(retained) AS BIGINT) AS n_retained,
           round(sum(retained)::DOUBLE / count(*), 6) AS retention_rate
    FROM j GROUP BY activity_band
    """,
)
def q194_churn_label_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-label construction with temporal separation: features from
    an observation window (Jan 1-14 activity), labels from a DISJOINT
    outcome window (Jan 15-28 presence) — the leakage-free supervised
    dataset builder (features may never see the label window), rolled
    up to the activity-band × retention audit a modeler checks before
    training.  Scale shape: both windows prune at the scan on the ts
    predicate, each collapses to one row per user on the same shuffle
    key, left join preserves churned users.  Rates exact-integer."""
    ev = _t(spark, sf_dir, "events")

    def win(lo, hi):
        return ev.where(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") < F.lit(hi).cast("timestamp"))
        )

    feat = win("2024-01-01", "2024-01-15").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
    )
    lbl = (
        win("2024-01-15", "2024-01-29")
        .select("user_id")
        .distinct()
        .withColumn("active", F.lit(1))
    )
    j = feat.join(lbl, "user_id", "left").select(
        F.least(F.expr("n_events div 10"), F.lit(5)).alias("activity_band"),
        F.coalesce(F.col("active"), F.lit(0)).alias("retained"),
    )
    return j.groupBy("activity_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("retained").cast("bigint").alias("n_retained"),
        F.round(F.sum("retained") / F.count(F.lit(1)), 6).alias("retention_rate"),
    ).select(
        F.col("activity_band").cast("bigint").alias("activity_band"),
        "n_users",
        "n_retained",
        "retention_rate",
    )


@_register(
    "q195_discount_lift",
    """
    WITH b AS (
      SELECT CASE WHEN l_discount < 0.005 THEN 0
                  WHEN l_discount < 0.055 THEN 1
                  ELSE 2 END AS band,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ),
    agg AS (
      SELECT band, count(*) AS n, sum(q) AS sq FROM b GROUP BY band
    ),
    base AS (SELECT sq AS s0, n AS n0 FROM agg WHERE band = 0)
    SELECT CAST(band AS BIGINT)        AS discount_band,
           CAST(n AS BIGINT)           AS n_items,
           round(sq::DOUBLE / n, 6)    AS avg_qty,
           round((sq::DOUBLE / n) / (base.s0::DOUBLE / base.n0), 6)
               AS lift_vs_no_discount
    FROM agg CROSS JOIN base
    """,
)
def q195_discount_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effectiveness read: average quantity per discount band
    and its lift against the no-discount baseline — the first-order
    'do discounts move volume' answer (q55 measures promo revenue
    share; this measures the volume response).  Band edges sit between
    the discrete discount levels (0.005, 0.055) so float representation
    of 0.00/0.05 can't flip a band.  One aggregation, baseline row
    broadcast back; every ratio is exact-integer."""
    b = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_discount") < 0.005, 0)
        .when(F.col("l_discount") < 0.055, 1)
        .otherwise(2)
        .alias("band"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    agg = b.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), F.sum("q").alias("sq")
    )
    base = agg.where(F.col("band") == 0).select(
        F.col("sq").alias("s0"), F.col("n").alias("n0")
    )
    return agg.crossJoin(F.broadcast(base)).select(
        F.col("band").cast("bigint").alias("discount_band"),
        F.col("n").cast("bigint").alias("n_items"),
        F.round(F.col("sq") / F.col("n"), 6).alias("avg_qty"),
        F.round(
            (F.col("sq") / F.col("n")) / (F.col("s0") / F.col("n0")), 6
        ).alias("lift_vs_no_discount"),
    )


@_register(
    "q196_latency_anova",
    """
    WITH lat AS (
      SELECT l.l_suppkey AS s,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                 AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    per AS (
      SELECT s, count(*) AS n, sum(days) AS sd, sum(days * days) AS sdd
      FROM lat GROUP BY s
    ),
    tot AS (
      SELECT sum(n) AS tn, sum(sd) AS tsd, sum(sdd) AS tsdd,
             count(*) AS k,
             sum(sd * sd / n::DOUBLE) AS sum_groupmean_term
      FROM per
    )
    SELECT CAST(k AS BIGINT)  AS n_suppliers,
           CAST(tn AS BIGINT) AS n_items,
           round(tsdd - tsd::DOUBLE * tsd / tn, 4)               AS ss_total,
           round(sum_groupmean_term - tsd::DOUBLE * tsd / tn, 4) AS ss_between,
           round((sum_groupmean_term - tsd::DOUBLE * tsd / tn)
                 / (tsdd - tsd::DOUBLE * tsd / tn), 6)           AS eta_squared,
           round(((sum_groupmean_term - tsd::DOUBLE * tsd / tn) / (k - 1))
                 / ((tsdd - sum_groupmean_term) / (tn - k)), 6)  AS f_stat
    FROM tot
    """,
)
def q196_latency_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of ship latency by supplier: how much of the
    latency variance is BETWEEN suppliers (eta² + F statistic) — the
    attribution question behind q136's percentile matrix ('is latency
    a supplier problem or noise?').  Exactness: per-supplier moment
    sums are exact integers; the only non-integer term (Σ sd²/n) is a
    sum of exact ratios accumulated per-GROUP (one term per supplier,
    ~100 values — far below float-order visibility at round 4).
    Scale shape: one fact join + per-supplier agg, then a scalar
    rollup; nothing after the first agg touches fact-sized data."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("s"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("days"),
    )
    per = lat.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("days").alias("sd"),
        F.sum(F.col("days") * F.col("days")).alias("sdd"),
    )
    tot = per.agg(
        F.sum("n").alias("tn"),
        F.sum("sd").alias("tsd"),
        F.sum("sdd").alias("tsdd"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("sd") * F.col("sd") / F.col("n")).alias("sum_groupmean_term"),
    )
    grand = F.col("tsd") * F.col("tsd") / F.col("tn")
    ss_total = F.col("tsdd") - grand
    ss_between = F.col("sum_groupmean_term") - grand
    ss_within = F.col("tsdd") - F.col("sum_groupmean_term")
    return tot.select(
        F.col("k").cast("bigint").alias("n_suppliers"),
        F.col("tn").cast("bigint").alias("n_items"),
        F.round(ss_total, 4).alias("ss_total"),
        F.round(ss_between, 4).alias("ss_between"),
        F.round(ss_between / ss_total, 6).alias("eta_squared"),
        F.round(
            (ss_between / (F.col("k") - 1)) / (ss_within / (F.col("tn") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@_register(
    "q197_panel_sparsity",
    """
    WITH months AS (
      SELECT count(DISTINCT date_trunc('month', o_orderdate)) AS n_months
      FROM orders
    ),
    custs AS (SELECT count(*) AS n_cust FROM customer),
    cells AS (
      SELECT count(*) AS filled FROM (
        SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate)
        FROM orders
      )
    ),
    active AS (
      SELECT count(DISTINCT o_custkey) AS n_active FROM orders
    )
    SELECT CAST(custs.n_cust AS BIGINT)   AS n_customers,
           CAST(active.n_active AS BIGINT) AS n_active_customers,
           CAST(months.n_months AS BIGINT) AS n_months,
           CAST(cells.filled AS BIGINT)    AS filled_cells,
           round(cells.filled::DOUBLE
                 / (custs.n_cust * months.n_months), 6) AS fill_rate,
           round(cells.filled::DOUBLE
                 / (active.n_active * months.n_months), 6) AS fill_rate_active
    FROM custs CROSS JOIN months CROSS JOIN cells CROSS JOIN active
    """,
)
def q197_panel_sparsity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panel sparsity report: what fraction of the (customer × month)
    grid has any order — the density check that decides whether
    longitudinal features (q144 retention, q161 trends) need explicit
    zero-filling (q109's resample) or can stay sparse.  Scale shape:
    the filled-cell count is one DISTINCT collapse of the fact; the
    three denominators are scalar aggregates cross-joined broadcast.
    All rates exact-integer."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.trunc("o_orderdate", "month").alias("m")
    )
    months = o.agg(F.countDistinct("m").alias("n_months"))
    custs = _t(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("n_cust"))
    cells = o.distinct().agg(F.count(F.lit(1)).alias("filled"))
    active = o.agg(F.countDistinct("o_custkey").alias("n_active"))
    return (
        custs.crossJoin(F.broadcast(months))
        .crossJoin(F.broadcast(cells))
        .crossJoin(F.broadcast(active))
        .select(
            F.col("n_cust").cast("bigint").alias("n_customers"),
            F.col("n_active").cast("bigint").alias("n_active_customers"),
            F.col("n_months").cast("bigint").alias("n_months"),
            F.col("filled").cast("bigint").alias("filled_cells"),
            F.round(
                F.col("filled") / (F.col("n_cust") * F.col("n_months")), 6
            ).alias("fill_rate"),
            F.round(
                F.col("filled") / (F.col("n_active") * F.col("n_months")), 6
            ).alias("fill_rate_active"),
        )
    )


@_register(
    "q198_supplier_skyline",
    """
    WITH m AS (
      SELECT l.l_suppkey AS s,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS price_c,
             count(*) AS n,
             sum(date_diff('day', o.o_orderdate, l.l_shipdate)) AS lat_d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_suppkey
    ),
    sky AS (
      SELECT a.s, a.price_c, a.n, a.lat_d
      FROM m a
      WHERE NOT EXISTS (
        SELECT 1 FROM m b
        WHERE b.price_c * a.n <= a.price_c * b.n
          AND b.lat_d * a.n <= a.lat_d * b.n
          AND (b.price_c * a.n < a.price_c * b.n
               OR b.lat_d * a.n < a.lat_d * b.n)
      )
    )
    SELECT CAST(s AS BIGINT) AS suppkey,
           round(price_c::DOUBLE / n / 100, 6) AS avg_price,
           round(lat_d::DOUBLE / n, 6)         AS avg_latency_days,
           CAST(n AS BIGINT)                   AS n_items
    FROM sky ORDER BY suppkey
    """,
)
def q198_supplier_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: suppliers not dominated on
    (avg price, avg ship latency) — the multi-criteria shortlist
    operator ('no other supplier is cheaper AND faster').  Dominance
    compares exact cross-multiplied integers (price_c·n' vs price_c'·n)
    so no float mean ever decides the frontier.  Scale shape: the fact
    collapses to one row per supplier FIRST; the dominance test is a
    self-anti-join on that dimension-sized frame (100 rows here; at
    millions of suppliers the sort-filter skyline replaces the
    quadratic probe — the aggregation stage is unchanged)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("pc"),
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("s"))
        .agg(
            F.sum("pc").alias("price_c"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.datediff("l_shipdate", "o_orderdate")).alias("lat_d"),
        )
        .localCheckpoint(eager=True)  # both sides of the dominance probe
    )
    a, b = m.alias("a"), m.alias("b")
    dominated = (
        (F.col("b.price_c") * F.col("a.n") <= F.col("a.price_c") * F.col("b.n"))
        & (F.col("b.lat_d") * F.col("a.n") <= F.col("a.lat_d") * F.col("b.n"))
        & (
            (F.col("b.price_c") * F.col("a.n") < F.col("a.price_c") * F.col("b.n"))
            | (F.col("b.lat_d") * F.col("a.n") < F.col("a.lat_d") * F.col("b.n"))
        )
    )
    sky = a.join(b, dominated, "left_anti")
    return sky.select(
        F.col("s").cast("bigint").alias("suppkey"),
        F.round(F.col("price_c") / F.col("n") / 100, 6).alias("avg_price"),
        F.round(F.col("lat_d") / F.col("n"), 6).alias("avg_latency_days"),
        F.col("n").cast("bigint").alias("n_items"),
    ).orderBy("suppkey")


@_register(
    "q199_weighted_sample",
    """
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             -ln(((doc_id * 2654435761) % 1000003 + 1)::DOUBLE / 1000004)
             / n_chars AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT CAST(doc_id AS BIGINT)  AS doc_id,
           lang                    AS lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           round(k, 10)            AS sample_key
    FROM keyed ORDER BY k ASC, doc_id LIMIT 50
    """,
)
def q199_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    each doc draws key = -ln(u)/w with weight w = n_chars, and the 50
    smallest keys form a sample where selection probability is
    proportional to length — the importance-sampling primitive for
    training-mix construction (long docs count more, but every doc can
    appear).  u comes from the stable multiplicative hash (exact
    rational in (0,1) — reproducible across engines/runs, never
    rand()); ln of identical doubles is identical, so the sample is
    deterministic.  Scale shape: key assignment is a map-side
    projection, selection is TakeOrderedAndProject — no sort, no
    shuffle beyond top-k."""
    d = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000003)) + 1) / F.lit(
        1000004.0
    )
    k = -F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", "n_chars", k.alias("k"))
        .orderBy(F.col("k").asc(), "doc_id")
        .limit(50)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round("k", 10).alias("sample_key"),
        )
    )


@_register(
    "q200_cusum_alerts",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CAST(round(value * 100) AS BIGINT)) AS rc
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
      GROUP BY 1
    ),
    tot AS (SELECT sum(rc) AS trc, count(*) AS nd FROM daily),
    dev AS (
      -- deviation scaled by n_days so everything stays integer:
      -- rc*nd - trc  ==  (rc - mean) * nd
      SELECT d, rc, rc * tot.nd - tot.trc AS dev_n, tot.nd AS nd
      FROM daily CROSS JOIN tot
    ),
    pre AS (
      SELECT d, rc, nd,
             sum(dev_n) OVER (ORDER BY d) AS s
      FROM dev
    ),
    cs AS (
      SELECT d, rc, nd, s,
             s - least(min(s) OVER (ORDER BY d), 0) AS cusum_n
      FROM pre
    )
    SELECT strftime(d, '%Y-%m-%d')               AS day,
           round(rc::DOUBLE / 100, 2)            AS revenue,
           round(cusum_n::DOUBLE / nd / 100, 6)  AS cusum,
           CAST(CASE WHEN cusum_n * 10 > 2 * (SELECT trc FROM tot)
                     THEN 1 ELSE 0 END AS BIGINT) AS alert
    FROM cs ORDER BY day
    """,
)
def q200_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change detection on daily purchase revenue — the SPC
    (statistical process control) drift alarm: positive CUSUM_i =
    S_i − min(0, min_{j≤i} S_j) where S is the prefix sum of
    (x − mean).  The clamp recursion isn't window-expressible, but
    this prefix-minus-running-min identity IS (same family as the
    drawdown decomposition) — two windows over the tiny daily frame.
    Deviations are scaled by n_days so every intermediate stays an
    exact integer (mean never materializes as a float); the alert
    threshold (20% of total revenue) compares scaled integers.
    Scale shape: daily rollup is the only fact pass; at a year of
    days the windows still touch 365 rows."""
    daily = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("rc")
    )
    tot = daily.agg(F.sum("rc").alias("trc"), F.count(F.lit(1)).alias("nd"))
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "rc",
        "nd",
        "trc",
        (F.col("rc") * F.col("nd") - F.col("trc")).alias("dev_n"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pre = dev.withColumn("s", F.sum("dev_n").over(w))
    cs = pre.withColumn(
        "cusum_n", F.col("s") - F.least(F.min("s").over(w), F.lit(0))
    )
    return cs.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(F.col("rc") / 100, 2).alias("revenue"),
        F.round(F.col("cusum_n") / F.col("nd") / 100, 6).alias("cusum"),
        F.when(F.col("cusum_n") * 10 > 2 * F.col("trc"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("alert"),
    ).orderBy("day")


@_register(
    "q201_price_vs_retail_margin",
    """
    WITH sold AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_c,
             sum(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(sold.rev_c)::DOUBLE / sum(sold.qty) / 100, 6)
               AS avg_realized_price,
           round(sum(CAST(round(p.p_retailprice * 100) AS BIGINT)
                     * sold.qty)::DOUBLE / sum(sold.qty) / 100, 6)
               AS avg_retail_price,
           round(sum(sold.rev_c)::DOUBLE
                 / sum(CAST(round(p.p_retailprice * 100) AS BIGINT) * sold.qty),
                 6) AS realization_ratio
    FROM sold JOIN part p ON p.p_partkey = sold.l_partkey
    GROUP BY p.p_brand
    ORDER BY brand
    """,
)
def q201_price_vs_retail_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-realization report: realized unit price vs catalog retail
    price per brand (quantity-weighted), and the realization ratio —
    the pricing-leakage metric ('how far below list do we actually
    sell').  Scale shape: the fact collapses per part FIRST (one
    shuffle), then the part dimension broadcasts in; both averages
    are quantity-weighted ratios of exact integer cents, so the
    ratio ordering is hash-stable."""
    sold = _t(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias(
            "rev_c"
        ),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
    )
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("retail_c"),
    )
    j = sold.join(F.broadcast(p), sold.l_partkey == p.p_partkey)
    return (
        j.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum("rev_c") / F.sum("qty") / 100, 6).alias(
                "avg_realized_price"
            ),
            F.round(
                F.sum(F.col("retail_c") * F.col("qty")) / F.sum("qty") / 100, 6
            ).alias("avg_retail_price"),
            F.round(
                F.sum("rev_c") / F.sum(F.col("retail_c") * F.col("qty")), 6
            ).alias("realization_ratio"),
        )
        .orderBy("brand")
    )


@_register(
    "q202_engagement_gini",
    """
    WITH uc AS (
      SELECT user_id, count(*) AS x FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM uc
    ),
    s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(i * x) AS six FROM ranked
    )
    SELECT CAST(n AS BIGINT)  AS n_users,
           CAST(sx AS BIGINT) AS n_events,
           round((2.0 * six) / (n * sx) - (n + 1.0) / n, 6) AS gini
    FROM s
    """,
)
def q202_engagement_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement concentration as a Gini coefficient over per-user
    event counts — the single-number inequality metric behind q151's
    decile Lorenz table (0 = uniform engagement, →1 = a few users
    generate everything).  G = 2Σi·x_i/(nΣx) − (n+1)/n over
    ascending-ranked EXACT integer counts (unique user tiebreak), so
    the statistic is bit-stable.  Scale shape: the fact collapses to
    one count per user, then the rank sum collapses AGAIN by count
    VALUE — users tied at x share consecutive ranks c+1..c+m (tie
    order irrelevant: they all multiply the same x), so
    Σi·x = Σ_x x·(m_x·c_x + m_x(m_x+1)/2) with c_x = exclusive prefix
    of m.  The only unpartitioned window therefore runs on the
    DISTINCT-COUNT-VALUE frame (bounded by max events/user — a domain
    bound, not a data bound; the registry window audit pins this),
    never on the user dimension.  Rank products accumulate in
    DECIMAL(38,0): n·x terms reach ~1e21 at 1e9 users, past int64
    (the q177 overflow discipline)."""
    uc = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    mx = uc.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    wp = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    pref = mx.withColumn("c", F.coalesce(F.sum("m").over(wp), F.lit(0)))
    dec = "decimal(38,0)"
    s = pref.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("x") * F.col("m")).alias("sx"),
        F.sum(
            F.col("x").cast(dec)
            * (
                F.col("m").cast(dec) * F.col("c").cast(dec)
                + (
                    F.col("m").cast(dec)
                    * (F.col("m").cast(dec) + 1)
                    / 2
                ).cast(dec)
            )
        ).alias("six"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("sx").cast("bigint").alias("n_events"),
        F.round(
            (2.0 * F.col("six"))
            / (F.col("n").cast("double") * F.col("sx"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@_register(
    "q203_retention_halflife",
    """
    WITH fo AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cm
      FROM orders GROUP BY o_custkey
    ),
    act AS (
      SELECT DISTINCT o.o_custkey,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(fo.cm) * 12 + month(fo.cm)) AS m
      FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
    ),
    r AS (
      SELECT sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS r1,
             sum(CASE WHEN m = 6 THEN 1 ELSE 0 END) AS r6,
             count(DISTINCT o_custkey) AS n_cohort
      FROM act
    )
    SELECT CAST(n_cohort AS BIGINT) AS n_customers,
           CAST(r1 AS BIGINT)       AS active_m1,
           CAST(r6 AS BIGINT)       AS active_m6,
           round(5.0 * ln(2) / ln(r1::DOUBLE / r6), 6) AS halflife_months
    FROM r
    """,
)
def q203_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: assuming geometric decay between months 1
    and 6 of the q144 retention curve, the months until activity
    halves — hl = 5·ln2 / ln(r1/r6).  The decay ratio r1/r6 is an
    exact rational of activity counts, so the single ln() is the same
    double on both engines (the q127 one-ln-of-exact-ratio
    discipline — a multi-point log-linear fit would sum
    order-sensitive floats).  Scale shape: identical to q144's
    co-partitioned cohort build, ending in one scalar row."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    fo = o.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cm")
    )
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    act = (
        o.join(fo, "o_custkey")
        .select(
            "o_custkey",
            (mnum(F.col("o_orderdate")) - mnum(F.col("cm"))).alias("m"),
        )
        .distinct()
    )
    r = act.agg(
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).alias("r1"),
        F.sum(F.when(F.col("m") == 6, 1).otherwise(0)).alias("r6"),
        F.countDistinct("o_custkey").alias("n_cohort"),
    )
    return r.select(
        F.col("n_cohort").cast("bigint").alias("n_customers"),
        F.col("r1").cast("bigint").alias("active_m1"),
        F.col("r6").cast("bigint").alias("active_m6"),
        F.round(
            5.0 * F.log(F.lit(2.0)) / F.log(F.col("r1") / F.col("r6")), 6
        ).alias("halflife_months"),
    )


@_register(
    "q204_quantile_trajectory",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mth,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    )
    SELECT strftime(mth, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(c, 0.5) / 100, 6)  AS p50,
           round(quantile_cont(c, 0.9) / 100, 6)  AS p90,
           round(quantile_cont(c, 0.99) / 100, 6) AS p99
    FROM m GROUP BY mth
    """,
)
def q204_quantile_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile trajectory: monthly p50/p90/p99 of order value — the
    distribution-over-time monitor (q136 is a static percentile
    matrix; drift shows up here first as tail percentiles moving while
    the median holds).  Exact interpolated quantiles on integer cents
    per month group; one aggregation keyed by month, map-side
    combinable input.  At 100 TB the per-month exact percentile swaps
    for approx_percentile, same plan."""
    m = _t(spark, sf_dir, "orders").select(
        F.trunc("o_orderdate", "month").alias("mth"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    return m.groupBy("mth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.expr("percentile(c, 0.5)") / 100, 6).alias("p50"),
        F.round(F.expr("percentile(c, 0.9)") / 100, 6).alias("p90"),
        F.round(F.expr("percentile(c, 0.99)") / 100, 6).alias("p99"),
    ).select(
        F.date_format("mth", "yyyy-MM").alias("month"),
        "n_orders",
        "p50",
        "p90",
        "p99",
    )


@_register(
    "q205_degree_assortativity",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING count(*) >= 2
    ),
    bi AS (SELECT pa AS s, pb AS d FROM e UNION ALL SELECT pb, pa FROM e),
    deg AS (SELECT s AS node, count(*) AS dg FROM bi GROUP BY s),
    ed AS (
      SELECT da.dg AS x, db.dg AS y
      FROM bi JOIN deg da ON da.node = bi.s JOIN deg db ON db.node = bi.d
    ),
    s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM ed
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)), 6)
               AS assortativity
    FROM s
    """,
)
def q205_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — the sixth graph
    kernel (after CC, PageRank, triangles, BFS, k-core): Pearson
    correlation of endpoint degrees over all directed edge instances
    (positive = hubs link hubs, negative = hub-and-spoke).  Exact
    integer moment sums (q177 discipline — degrees are small ints, no
    decimal needed at this graph size), one ln-free closed form.
    Scale shape: degrees aggregate once, join back onto the edge list
    by node key twice, then a scalar rollup; edges come from the
    shared co-purchase artifact."""
    from stock_ops_spark.operators.graph import copurchase_edges_cached

    e = copurchase_edges_cached(
        _t(spark, sf_dir, "lineitem"),
        source_path=catalog.table_path(sf_dir, "lineitem"),
        support=2,
    ).select("pa", "pb")
    bi = e.select(F.col("pa").alias("s"), F.col("pb").alias("d")).union(
        e.select(F.col("pb").alias("s"), F.col("pa").alias("d"))
    )
    deg = bi.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("dg"))
    da = deg.select(F.col("node").alias("s"), F.col("dg").alias("x"))
    db = deg.select(F.col("node").alias("d"), F.col("dg").alias("y"))
    ed = bi.join(F.broadcast(da), "s").join(F.broadcast(db), "d")
    s = ed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        (F.col("n") / 2).cast("bigint").alias("n_edges"),
        F.round(cov / F.sqrt(vx.cast("double") * vy), 6).alias("assortativity"),
    )


@_register(
    "q206_qq_table",
    """
    WITH p AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 'B' ELSE 'A' END AS grp
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
    ),
    s AS (
      SELECT
        quantile_cont(v, 0.1)  FILTER (grp = 'A') AS a10,
        quantile_cont(v, 0.25) FILTER (grp = 'A') AS a25,
        quantile_cont(v, 0.5)  FILTER (grp = 'A') AS a50,
        quantile_cont(v, 0.75) FILTER (grp = 'A') AS a75,
        quantile_cont(v, 0.9)  FILTER (grp = 'A') AS a90,
        quantile_cont(v, 0.1)  FILTER (grp = 'B') AS b10,
        quantile_cont(v, 0.25) FILTER (grp = 'B') AS b25,
        quantile_cont(v, 0.5)  FILTER (grp = 'B') AS b50,
        quantile_cont(v, 0.75) FILTER (grp = 'B') AS b75,
        quantile_cont(v, 0.9)  FILTER (grp = 'B') AS b90
      FROM p
    )
    SELECT 0.1 AS quantile, round(a10 / 100, 6) AS weekday_value,
           round(b10 / 100, 6) AS weekend_value,
           round((b10 - a10) / 100, 6) AS diff FROM s
    UNION ALL SELECT 0.25, round(a25 / 100, 6), round(b25 / 100, 6),
           round((b25 - a25) / 100, 6) FROM s
    UNION ALL SELECT 0.5, round(a50 / 100, 6), round(b50 / 100, 6),
           round((b50 - a50) / 100, 6) FROM s
    UNION ALL SELECT 0.75, round(a75 / 100, 6), round(b75 / 100, 6),
           round((b75 - a75) / 100, 6) FROM s
    UNION ALL SELECT 0.9, round(a90 / 100, 6), round(b90 / 100, 6),
           round((b90 - a90) / 100, 6) FROM s
    """,
)
def q206_qq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile comparison table: weekday vs weekend purchase
    values at five matched quantiles — where q186's KS says THAT the
    distributions differ, the QQ table says WHERE (which part of the
    distribution shifted, by how much).  Spark's percentile() needs a
    FOLDABLE fraction, so the five quantiles are literal aggregate
    expressions in ONE pass over the fact (conditional per group) and
    the 1-row result unpivots to 5 rows for free (q152's explode
    discipline — the DuckDB twin unpivots its CTE the same way).
    Exact interpolated quantiles on integer cents; diffs exact."""
    p = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
        F.when(F.dayofweek("ts").isin(1, 7), "B").otherwise("A").alias("grp"),
    )
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    aggs = []
    for g in ("A", "B"):
        for q in qs:
            aggs.append(
                F.expr(
                    f"percentile(CASE WHEN grp = '{g}' THEN v END, {q})"
                ).alias(f"{g.lower()}{int(q * 100)}")
            )
    s = p.agg(*aggs)
    structs = [
        F.struct(
            F.lit(q).alias("quantile"),
            F.round(F.col(f"a{int(q * 100)}") / 100, 6).alias("weekday_value"),
            F.round(F.col(f"b{int(q * 100)}") / 100, 6).alias("weekend_value"),
            F.round(
                (F.col(f"b{int(q * 100)}") - F.col(f"a{int(q * 100)}")) / 100, 6
            ).alias("diff"),
        )
        for q in qs
    ]
    return s.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


@_register(
    "q207_hourly_mix_entropy",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)    AS c1,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)     AS c2,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)   AS c4,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)    AS c5,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(n AS BIGINT) AS n_events,
           round(
             (CASE WHEN c1 = 0 THEN 0 ELSE -(c1::DOUBLE / n) * ln(c1::DOUBLE / n) END)
           + (CASE WHEN c2 = 0 THEN 0 ELSE -(c2::DOUBLE / n) * ln(c2::DOUBLE / n) END)
           + (CASE WHEN c3 = 0 THEN 0 ELSE -(c3::DOUBLE / n) * ln(c3::DOUBLE / n) END)
           + (CASE WHEN c4 = 0 THEN 0 ELSE -(c4::DOUBLE / n) * ln(c4::DOUBLE / n) END)
           + (CASE WHEN c5 = 0 THEN 0 ELSE -(c5::DOUBLE / n) * ln(c5::DOUBLE / n) END),
             6) AS mix_entropy
    FROM h
    """,
)
def q207_hourly_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-mix entropy per hour: Shannon entropy of the
    event-type distribution — the diversity monitor that catches
    bot/incident hours (entropy collapses when one type floods).
    Determinism: the five types PIVOT to one row per hour, so the
    entropy is a FIXED-ORDER five-term expression over exact-integer
    ratios (a per-type sum would accumulate floats in partition
    order).  Scale shape: one conditional aggregation keyed by hour,
    map-side combinable; ~8.8k rows/year output."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hr"), "event_type"
    )
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"c{i}")
        for i, t in enumerate(types, 1)
    ] + [F.count(F.lit(1)).alias("n")]
    h = ev.groupBy("hr").agg(*aggs)
    ent = None
    for i in range(1, 6):
        p = F.col(f"c{i}") / F.col("n")
        term = F.when(F.col(f"c{i}") == 0, 0.0).otherwise(-p * F.log(p))
        ent = term if ent is None else ent + term
    return h.select(
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast("bigint").alias("n_events"),
        F.round(ent, 6).alias("mix_entropy"),
    )


@_register(
    "q208_peak_to_average",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr, count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT)   AS n_hours,
           CAST(sum(n) AS BIGINT)     AS n_events,
           round(avg(n), 6)           AS mean_per_hour,
           round(quantile_cont(n, 0.95), 6) AS p95_per_hour,
           CAST(max(n) AS BIGINT)     AS max_per_hour,
           round(quantile_cont(n, 0.95) * count(*) / sum(n), 6)
               AS peak_to_average
    FROM h
    """,
)
def q208_peak_to_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-to-average load ratio: p95 hourly event rate over the mean —
    the capacity-planning number that, with q181's state profile,
    feeds plans/sizing.py (provision for p95, not the mean; PAR >> 1
    means bursty arrival and autoscaling headroom).  One hourly
    rollup then a scalar aggregate with an exact quantile over the
    tiny hourly frame; the ratio multiplies exact integers before the
    one division."""
    h = _t(spark, sf_dir, "events").groupBy(
        F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    return h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.round(F.avg("n"), 6).alias("mean_per_hour"),
        F.round(F.expr("percentile(n, 0.95)"), 6).alias("p95_per_hour"),
        F.max("n").cast("bigint").alias("max_per_hour"),
        F.round(
            F.expr("percentile(n, 0.95)") * F.count(F.lit(1)) / F.sum("n"), 6
        ).alias("peak_to_average"),
    )


@_register(
    "q209_heaps_law",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    firsts AS (
      SELECT t, min(doc_id) AS fd FROM tok WHERE t <> '' GROUP BY t
    ),
    toks_per_doc AS (
      SELECT doc_id, count(*) AS nt FROM tok WHERE t <> '' GROUP BY doc_id
    ),
    new_per_doc AS (
      SELECT fd AS doc_id, count(*) AS nw FROM firsts GROUP BY fd
    ),
    cum AS (
      SELECT tp.doc_id,
             sum(tp.nt) OVER (ORDER BY tp.doc_id) AS cum_tokens,
             sum(coalesce(np.nw, 0)) OVER (ORDER BY tp.doc_id) AS cum_vocab
      FROM toks_per_doc tp LEFT JOIN new_per_doc np ON np.doc_id = tp.doc_id
    ),
    pts AS (
      SELECT max(CASE WHEN doc_id * 10 < (SELECT max(doc_id) FROM cum)
                      THEN cum_tokens END) AS t1,
             max(CASE WHEN doc_id * 10 < (SELECT max(doc_id) FROM cum)
                      THEN cum_vocab END)  AS v1,
             max(cum_tokens) AS t2, max(cum_vocab) AS v2
      FROM cum
    )
    SELECT CAST(t2 AS BIGINT) AS total_tokens,
           CAST(v2 AS BIGINT) AS total_vocab,
           CAST(t1 AS BIGINT) AS tokens_at_10pct,
           CAST(v1 AS BIGINT) AS vocab_at_10pct,
           round(ln(v2::DOUBLE / v1) / ln(t2::DOUBLE / t1), 6)
               AS heaps_beta
    FROM pts
    """,
)
def q209_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth exponent: how fast distinct
    vocabulary grows with corpus size (V ~ T^beta; beta >> 0.6 on this
    corpus means heavy novel-token load — tokenizer OOV pressure at
    scale; near 0 means a closed vocabulary).  Cumulative distinct is
    not window-decomposable — the trick is first-occurrence
    attribution (word → min doc_id, one agg), after which cumulative
    vocabulary IS a prefix sum of new-words-per-doc, computed with the
    chunked two-pass operator.  beta comes from TWO exact-integer
    curve points via ln-of-exact-ratio (the q127/q203 discipline), not
    a float regression."""
    from stock_ops_spark.operators.timeseries import prefix_sum_chunked

    tok = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).where(F.col("t") != "")
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    tpd = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    npd = firsts.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("nw")
    )
    per_doc = tpd.join(npd, "doc_id", "left").select(
        "doc_id", "nt", F.coalesce("nw", F.lit(0)).alias("nw")
    )
    bucket = F.floor(F.col("doc_id") / 64)
    ct = prefix_sum_chunked(per_doc, "doc_id", "nt", bucket).withColumnRenamed(
        "__cum", "cum_tokens"
    )
    cum = prefix_sum_chunked(ct, "doc_id", "nw", bucket).withColumnRenamed(
        "__cum", "cum_vocab"
    )
    mx = cum.agg(F.max("doc_id").alias("mxd"))
    pts = cum.crossJoin(F.broadcast(mx)).agg(
        F.max(
            F.when(F.col("doc_id") * 10 < F.col("mxd"), F.col("cum_tokens"))
        ).alias("t1"),
        F.max(
            F.when(F.col("doc_id") * 10 < F.col("mxd"), F.col("cum_vocab"))
        ).alias("v1"),
        F.max("cum_tokens").alias("t2"),
        F.max("cum_vocab").alias("v2"),
    )
    return pts.select(
        F.col("t2").cast("bigint").alias("total_tokens"),
        F.col("v2").cast("bigint").alias("total_vocab"),
        F.col("t1").cast("bigint").alias("tokens_at_10pct"),
        F.col("v1").cast("bigint").alias("vocab_at_10pct"),
        F.round(
            F.log(F.col("v2") / F.col("v1")) / F.log(F.col("t2") / F.col("t1")), 6
        ).alias("heaps_beta"),
    )


@_register(
    "q210_launch_curve",
    """
    WITH pf AS (
      SELECT l_partkey, min(l_shipdate) AS first_ship
      FROM lineitem GROUP BY l_partkey
    ),
    j AS (
      SELECT l.l_partkey,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS total_c,
             sum(CASE WHEN l.l_shipdate < pf.first_ship + INTERVAL 28 DAY
                      THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      ELSE 0 END) AS early_c
      FROM lineitem l JOIN pf ON pf.l_partkey = l.l_partkey
      GROUP BY l.l_partkey
    ),
    banded AS (
      SELECT least(CAST(floor(early_c * 10.0 / total_c) AS BIGINT), 9) AS band
      FROM j WHERE total_c > 0
    )
    SELECT CAST(band AS BIGINT)      AS early_share_band,
           CAST(count(*) AS BIGINT)  AS n_parts,
           round(count(*)::DOUBLE / (SELECT count(*) FROM banded), 6)
               AS frac_of_parts
    FROM banded GROUP BY band
    """,
)
def q210_launch_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Launch-curve profile: per part, the share of lifetime revenue
    earned in its first 28 days on sale, histogrammed — separates
    launch-spike products (band 9: front-loaded demand) from
    evergreens (band 0-1), the assortment-planning signal.  Scale
    shape: first-ship dates and the conditional revenue split share
    ONE l_partkey shuffle (co-partitioned agg + join + agg); the band
    histogram is 10 keys.  Band assignment multiplies exact integers
    before the one floor-divide."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("pc"),
    )
    pf = li.groupBy("l_partkey").agg(F.min("l_shipdate").alias("first_ship"))
    j = (
        li.join(pf, "l_partkey")
        .groupBy("l_partkey")
        .agg(
            F.sum("pc").alias("total_c"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    < F.col("first_ship") + F.expr("INTERVAL 28 DAYS"),
                    F.col("pc"),
                ).otherwise(0)
            ).alias("early_c"),
        )
        .where(F.col("total_c") > 0)
    )
    banded = j.select(
        F.least(
            F.floor(F.col("early_c") * 10.0 / F.col("total_c")).cast("bigint"),
            F.lit(9),
        ).alias("band")
    )
    tot = banded.agg(F.count(F.lit(1)).alias("t"))
    return (
        banded.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("band").cast("bigint").alias("early_share_band"),
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.round(F.col("n_parts") / F.col("t"), 6).alias("frac_of_parts"),
        )
    )


@_register(
    "q211_cohort_ltv_curve",
    """
    WITH fo AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cm
      FROM orders GROUP BY o_custkey
    ),
    sp AS (
      SELECT year(fo.cm) AS cohort_year,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(fo.cm) * 12 + month(fo.cm)) AS m,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rc
      FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
      GROUP BY cohort_year, m
    ),
    cs AS (
      SELECT year(cm) AS cohort_year, count(*) AS n_cust FROM fo GROUP BY 1
    )
    SELECT CAST(sp.cohort_year AS BIGINT) AS cohort_year,
           CAST(sp.m AS BIGINT)           AS months_since,
           round(sum(sp2.rc)::DOUBLE / cs.n_cust / 100, 6)
               AS cum_ltv_per_customer
    FROM sp
    JOIN sp sp2 ON sp2.cohort_year = sp.cohort_year AND sp2.m <= sp.m
    JOIN cs ON cs.cohort_year = sp.cohort_year
    WHERE sp.m <= 12
    GROUP BY sp.cohort_year, sp.m, cs.n_cust
    """,
)
def q211_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV accumulation curves: cumulative revenue per customer
    by months-since-acquisition, one curve per acquisition year — the
    money-weighted companion to q144's activity retention (the payback
    chart that answers 'when does a cohort repay its CAC').  Scale
    shape: the co-partitioned cohort build (q144's shuffle), a tiny
    (year × month) rollup, and the cumulative is a band self-join on
    the ~84-row rollup frame (a window would do; the join form keeps
    the SQL twin identical).  LTV = ratio of exact cent sums."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    fo = o.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cm")
    )
    mnum = lambda col: F.year(col) * 12 + F.month(col)  # noqa: E731
    sp = (
        o.join(fo, "o_custkey")
        .groupBy(
            F.year("cm").alias("cohort_year"),
            (mnum(F.col("o_orderdate")) - mnum(F.col("cm"))).alias("m"),
        )
        .agg(F.sum("c").alias("rc"))
    )
    cs = fo.groupBy(F.year("cm").alias("cohort_year")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    a, b = sp.alias("a"), sp.alias("b")
    return (
        a.where(F.col("a.m") <= 12)
        .join(
            F.broadcast(b),
            (F.col("b.cohort_year") == F.col("a.cohort_year"))
            & (F.col("b.m") <= F.col("a.m")),
        )
        .groupBy(
            F.col("a.cohort_year").alias("cohort_year"), F.col("a.m").alias("m")
        )
        .agg(F.sum(F.col("b.rc")).alias("cum_rc"))
        .join(F.broadcast(cs), "cohort_year")
        .select(
            F.col("cohort_year").cast("bigint").alias("cohort_year"),
            F.col("m").cast("bigint").alias("months_since"),
            F.round(F.col("cum_rc") / F.col("n_cust") / 100, 6).alias(
                "cum_ltv_per_customer"
            ),
        )
    )


@_register(
    "q212_basket_diversity",
    """
    WITH ob AS (
      SELECT l.l_orderkey,
             count(DISTINCT p.p_brand) AS n_brands,
             count(*) AS n_items
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY l.l_orderkey
    )
    SELECT CAST(n_brands AS BIGINT)  AS n_brands,
           CAST(count(*) AS BIGINT)  AS n_orders,
           round(avg(n_items), 6)    AS avg_items,
           round(count(*)::DOUBLE / (SELECT count(*) FROM ob), 6)
               AS frac_of_orders
    FROM ob GROUP BY n_brands
    """,
)
def q212_basket_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket brand-diversity histogram: distinct brands per order —
    single-brand baskets signal brand-loyal trips, wide baskets signal
    marketplace behavior (assortment/recommendation input next to
    q137's association rules).  Scale shape: brand lookup is a
    broadcast dimension join, the per-order distinct collapses on the
    l_orderkey shuffle, the histogram is a handful of keys.  All
    ratios exact-integer."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("p_brand").alias("n_brands"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    tot = ob.agg(F.count(F.lit(1)).alias("t"))
    return (
        ob.groupBy("n_brands")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("n_items"), 6).alias("avg_items"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_brands").cast("bigint").alias("n_brands"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
            "avg_items",
            F.round(F.col("n_orders") / F.col("t"), 6).alias("frac_of_orders"),
        )
    )


@_register(
    "q213_table_inventory",
    """
    SELECT 'region' AS table_name, (SELECT count(*) FROM region) AS n_rows
    UNION ALL SELECT 'nation', (SELECT count(*) FROM nation)
    UNION ALL SELECT 'customer', (SELECT count(*) FROM customer)
    UNION ALL SELECT 'supplier', (SELECT count(*) FROM supplier)
    UNION ALL SELECT 'part', (SELECT count(*) FROM part)
    UNION ALL SELECT 'orders', (SELECT count(*) FROM orders)
    UNION ALL SELECT 'lineitem', (SELECT count(*) FROM lineitem)
    UNION ALL SELECT 'events', (SELECT count(*) FROM events)
    UNION ALL SELECT 'documents', (SELECT count(*) FROM documents)
    UNION ALL SELECT 'embeddings', (SELECT count(*) FROM embeddings)
    """,
)
def q213_table_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog inventory: row counts for every table — the first query
    any engine user runs, and the freshness/completeness check a
    pipeline logs per run (the Spark side of operators/stats.py's
    incremental table stats, A5).  Each count is a metadata-cheap
    columnless aggregate over one scan; at 100 TB these resolve from
    parquet footer row counts, not data reads."""
    import pyspark.sql.functions as _F

    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = None
    for t in names:
        row = _t(spark, sf_dir, t).agg(
            _F.lit(t).alias("table_name"),
            _F.count(_F.lit(1)).cast("bigint").alias("n_rows"),
        )
        out = row if out is None else out.union(row)
    return out


@_register(
    "q214_stockout_proxy",
    """
    WITH gaps AS (
      SELECT l_partkey,
             date_diff('day',
                       lag(l_shipdate) OVER (PARTITION BY l_partkey
                                             ORDER BY l_shipdate, l_orderkey,
                                                      l_linenumber),
                       l_shipdate) AS gap_d
      FROM lineitem
    ),
    per AS (
      SELECT l_partkey,
             count(*) AS n_gaps,
             max(gap_d) AS max_gap,
             quantile_cont(gap_d, 0.5) AS med_gap
      FROM gaps WHERE gap_d IS NOT NULL
      GROUP BY l_partkey HAVING count(*) >= 5
    )
    SELECT CAST(l_partkey AS BIGINT) AS partkey,
           CAST(n_gaps AS BIGINT)    AS n_gaps,
           CAST(max_gap AS BIGINT)   AS max_gap_days,
           round(med_gap, 6)         AS median_gap_days,
           round(max_gap / med_gap, 6) AS stockout_ratio
    FROM per WHERE med_gap > 0 AND max_gap > 4 * med_gap
    ORDER BY max_gap / med_gap DESC, partkey LIMIT 20
    """,
)
def q214_stockout_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stockout proxy: parts whose LONGEST gap between shipments dwarfs
    their median gap (max > 4× median, ≥5 gaps observed) — a demand
    interruption or supply outage signal derived from shipment cadence
    alone.  Robust by construction: the median gap (exact quantile on
    integer day diffs) is immune to the outlier being hunted.  Scale
    shape: one shuffle (partition by part) feeds the lag; the
    per-part aggregate rides the same key; top-20 by the exact-ratio
    ordering key with id tiebreak."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    gaps = li.select(
        "l_partkey",
        F.datediff("l_shipdate", F.lag("l_shipdate").over(w)).alias("gap_d"),
    ).where(F.col("gap_d").isNotNull())
    per = (
        gaps.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.max("gap_d").alias("max_gap"),
            F.expr("percentile(gap_d, 0.5)").alias("med_gap"),
        )
        .where((F.col("n_gaps") >= 5) & (F.col("med_gap") > 0))
        .where(F.col("max_gap") > 4 * F.col("med_gap"))
    )
    return (
        per.select(
            F.col("l_partkey").cast("bigint").alias("partkey"),
            F.col("n_gaps").cast("bigint").alias("n_gaps"),
            F.col("max_gap").cast("bigint").alias("max_gap_days"),
            F.round("med_gap", 6).alias("median_gap_days"),
            (F.col("max_gap") / F.col("med_gap")).alias("__r"),
        )
        .orderBy(F.col("__r").desc(), "partkey")
        .limit(20)
        .select(
            "partkey",
            "n_gaps",
            "max_gap_days",
            "median_gap_days",
            F.round("__r", 6).alias("stockout_ratio"),
        )
    )


@_register(
    "q215_acquisition_quality",
    """
    WITH fo AS (
      SELECT o_custkey,
             min_by(CAST(round(o_totalprice * 100) AS BIGINT),
                    date_diff('day', DATE '1990-01-01', o_orderdate)
                    * 10000000000000 + o_orderkey) AS first_c,
             min(date_trunc('month', o_orderdate)) AS fm
      FROM orders GROUP BY o_custkey
    )
    SELECT strftime(fm, '%Y-%m')     AS acquisition_month,
           CAST(count(*) AS BIGINT)  AS n_new_customers,
           round(sum(first_c)::DOUBLE / count(*) / 100, 6) AS avg_first_aov
    FROM fo GROUP BY fm
    """,
)
def q215_acquisition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-quality trend: average FIRST-order value by
    acquisition month — falling first-AOV with steady signup volume is
    the classic sign that marketing is buying lower-intent customers
    (the quality companion to q182's new/returning split).  min_by
    over a scalar (days·1e13 + orderkey) composite — unique and
    order-equivalent to (date, orderkey) while orderkey < 1e13
    (TPC-H orderkeys reach ~6e11 at sf=100k ≈ 100 TB, so the bound
    holds with >16× headroom; days-since-1990 ≤ ~2e4 keeps the
    product ≤ 2e17, inside int64); engines' min_by doesn't take
    struct keys — picks each customer's first order deterministically
    in the same shuffle as the month rollup.
    All averages exact-cent ratios."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    ordkey = (
        F.datediff("o_orderdate", F.lit("1990-01-01").cast("date")).cast("bigint")
        * 10000000000000
        + F.col("o_orderkey")
    )
    fo = o.groupBy("o_custkey").agg(
        F.min_by("c", ordkey).alias("first_c"),
        F.min(F.trunc("o_orderdate", "month")).alias("fm"),
    )
    return fo.groupBy("fm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_customers"),
        F.round(F.sum("first_c") / F.count(F.lit(1)) / 100, 6).alias(
            "avg_first_aov"
        ),
    ).select(
        F.date_format("fm", "yyyy-MM").alias("acquisition_month"),
        "n_new_customers",
        "avg_first_aov",
    )


@_register(
    "q216_brand_return_rates",
    """
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_returned,
           round(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6)     AS return_rate,
           round(sum(CASE WHEN l.l_returnflag = 'R'
                          THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          ELSE 0 END)::DOUBLE / 100, 2) AS returned_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    ORDER BY sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::DOUBLE
             / count(*) DESC, p.p_brand
    """,
)
def q216_brand_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate leaderboard by brand: item return share and returned
    revenue — the product-quality ranking that q185's customer view
    complements (who returns vs what gets returned).  One broadcast
    dimension join, one aggregation; the rate ordering key is a ratio
    of exact integers (brand tiebreak), so the leaderboard is
    hash-stable."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("pc"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "nr"
            ),
            F.sum(
                F.when(F.col("l_returnflag") == "R", F.col("pc")).otherwise(0)
            ).alias("rrc"),
        )
    )
    return (
        agg.select(
            "brand",
            F.col("n").cast("bigint").alias("n_items"),
            F.col("nr").cast("bigint").alias("n_returned"),
            F.round(F.col("nr") / F.col("n"), 6).alias("return_rate"),
            F.round(F.col("rrc") / 100, 2).alias("returned_revenue"),
        )
        .orderBy(F.col("return_rate").desc(), "brand")
    )


@_register(
    "q217_same_day_consolidation",
    """
    WITH dd AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, count(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS multi_order_days,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
               AS orders_on_those_days,
           CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
               AS consolidatable_orders,
           round(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END)::DOUBLE
                 / sum(n), 6) AS consolidation_rate
    FROM dd
    """,
)
def q217_same_day_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipment-consolidation opportunity: (customer, day) pairs with
    more than one order — each extra order that day is a mergeable
    shipment; the rate quantifies fulfillment waste.  One
    (customer, day) rollup (map-side combinable) then a scalar
    aggregate; all measures exact integers."""
    dd = _t(spark, sf_dir, "orders").groupBy(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    multi = F.when(F.col("n") > 1, F.col("n")).otherwise(0)
    return dd.agg(
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("multi_order_days"),
        F.sum(multi).cast("bigint").alias("orders_on_those_days"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
        .cast("bigint")
        .alias("consolidatable_orders"),
        F.round(
            F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
            / F.sum("n"),
            6,
        ).alias("consolidation_rate"),
    )


@_register(
    "q218_funnel_integrity",
    """
    WITH fs AS (
      SELECT user_id, min(ts) AS first_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    fp AS (
      SELECT user_id, min(ts) AS first_purchase FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    j AS (
      SELECT fp.user_id,
             CASE WHEN fs.user_id IS NULL THEN 'purchase_no_signup'
                  WHEN fp.first_purchase < fs.first_signup
                      THEN 'purchase_before_signup'
                  ELSE 'ok' END AS status
      FROM fp LEFT JOIN fs ON fs.user_id = fp.user_id
    )
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_users,
           round(count(*)::DOUBLE / (SELECT count(*) FROM j), 6)
               AS frac_of_purchasers
    FROM j GROUP BY status
    """,
)
def q218_funnel_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel-integrity audit: purchasers whose first purchase precedes
    their first signup (or who never signed up) — the event-ordering
    data-quality check that catches clock skew, backfill bugs, or
    identity-stitching gaps before funnel metrics (q132/q156) are
    trusted.  Both event subsets collapse to one row per user on the
    same shuffle key; counts exact."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fs = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    j = fp.join(fs, "user_id", "left").select(
        F.when(F.col("first_signup").isNull(), "purchase_no_signup")
        .when(F.col("first_purchase") < F.col("first_signup"), "purchase_before_signup")
        .otherwise("ok")
        .alias("status")
    )
    tot = j.agg(F.count(F.lit(1)).alias("t"))
    return (
        j.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "status",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(F.col("n_users") / F.col("t"), 6).alias(
                "frac_of_purchasers"
            ),
        )
    )


@_register(
    "q219_click_propensity",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'click' AND value IS NOT NULL
    ),
    p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    thr AS (
      SELECT quantile_cont(c, 0.25) AS t1, quantile_cont(c, 0.5) AS t2,
             quantile_cont(c, 0.75) AS t3
      FROM clicks
    ),
    flagged AS (
      SELECT cl.event_id,
             1 + (cl.c > thr.t1)::INT + (cl.c > thr.t2)::INT
               + (cl.c > thr.t3)::INT AS band,
             CASE WHEN EXISTS (
               SELECT 1 FROM p
               WHERE p.user_id = cl.user_id
                 AND p.ts > cl.ts AND p.ts <= cl.ts + INTERVAL 1 HOUR
             ) THEN 1 ELSE 0 END AS converted
      FROM clicks cl CROSS JOIN thr
    )
    SELECT CAST(band AS BIGINT)          AS value_band,
           CAST(count(*) AS BIGINT)      AS n_clicks,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(sum(converted)::DOUBLE / count(*), 6) AS conversion_1h
    FROM flagged GROUP BY band
    """,
)
def q219_click_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase propensity by click-value quartile: does a
    higher-value click convert (same user purchasing within the next
    hour) more often — the treatment-intensity read behind bid/rank
    tuning.  Scale shape: the 1-hour follow-up is a LEFT SEMI
    user-equi-join with a time band residual (fan-out bounded by the
    user's purchases that hour, never a time-only band); quartile
    bands come from broadcast exact thresholds (q145 discipline).
    Rates exact-integer."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(
        (F.col("event_type") == "click") & F.col("value").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    thr = clicks.agg(
        F.expr("percentile(c, 0.25)").alias("t1"),
        F.expr("percentile(c, 0.5)").alias("t2"),
        F.expr("percentile(c, 0.75)").alias("t3"),
    )
    conv = clicks.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("pts") > F.col("ts"))
        & (F.col("pts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select("event_id")
    flagged = (
        clicks.crossJoin(F.broadcast(thr))
        .join(conv.withColumn("converted", F.lit(1)), "event_id", "left")
        .select(
            (
                1
                + (F.col("c") > F.col("t1")).cast("int")
                + (F.col("c") > F.col("t2")).cast("int")
                + (F.col("c") > F.col("t3")).cast("int")
            ).alias("band"),
            F.coalesce("converted", F.lit(0)).alias("converted"),
        )
    )
    return flagged.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(F.sum("converted") / F.count(F.lit(1)), 6).alias(
            "conversion_1h"
        ),
    ).select(
        F.col("band").cast("bigint").alias("value_band"),
        "n_clicks",
        "n_converted",
        "conversion_1h",
    )


@_register(
    "q220_transition_dwell",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER w AS prev_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev_type || '>' || event_type AS transition,
           CAST(count(*) AS BIGINT)      AS n,
           round(quantile_cont(gap_us, 0.5) / 1000000, 6) AS median_gap_s,
           round(quantile_cont(gap_us, 0.9) / 1000000, 6) AS p90_gap_s
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY transition
    ORDER BY transition
    """,
)
def q220_transition_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time by behavioral transition: median and p90 gap between
    consecutive events for each (prev→next) type pair — where q160
    gives transition PROBABILITIES, this gives transition LATENCIES
    (slow click→purchase = decision friction; instant error→error =
    retry storm).  One user-partitioned window feeds both lag()s;
    gaps are exact integer micros, quantiles exact per 25-key group."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).where(F.col("prev_type").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "prev_type", "event_type").alias("transition"),
            "gap_us",
        )
        .groupBy("transition")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.expr("percentile(gap_us, 0.5)") / 1000000, 6).alias(
                "median_gap_s"
            ),
            F.round(F.expr("percentile(gap_us, 0.9)") / 1000000, 6).alias(
                "p90_gap_s"
            ),
        )
        .orderBy("transition")
    )


@_register(
    "q221_hot_entity_ceiling",
    """
    WITH uh AS (
      SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT)        AS n_user_hours,
           CAST(max(n) AS BIGINT)          AS max_events,
           round(quantile_cont(n, 0.99), 6) AS p99_events,
           round(quantile_cont(n, 0.5), 6)  AS median_events,
           round(max(n) / quantile_cont(n, 0.5), 6) AS ceiling_ratio
    FROM uh
    """,
)
def q221_hot_entity_ceiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-entity ceiling: the busiest (user, hour) cell vs the median —
    the per-KEY burst bound that q208's global peak-to-average misses
    (a stateful operator partitions by key, so its worst task is the
    hottest key, not the hottest hour).  Feeds sizing.py's state
    budget and the q173→salting decision for per-user stateful
    streams.  One (user, hour) rollup then a scalar aggregate with
    exact quantiles."""
    uh = _t(spark, sf_dir, "events").groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return uh.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_user_hours"),
        F.max("n").cast("bigint").alias("max_events"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_events"),
        F.round(F.expr("percentile(n, 0.5)"), 6).alias("median_events"),
        F.round(F.max("n") / F.expr("percentile(n, 0.5)"), 6).alias(
            "ceiling_ratio"
        ),
    )


@_register(
    "q222_recency_weighted_popularity",
    """
    WITH mx AS (SELECT max(l_shipdate) AS m FROM lineitem),
    w AS (
      SELECT l_partkey,
             power(2.0, -least(CAST(floor(
                 date_diff('day', l_shipdate, mx.m) / 7.0) AS BIGINT), 30))
                 AS wgt
      FROM lineitem CROSS JOIN mx
    )
    SELECT CAST(l_partkey AS BIGINT) AS partkey,
           CAST(count(*) AS BIGINT)  AS n_sales,
           round(sum(wgt), 6)        AS popularity
    FROM w GROUP BY l_partkey
    ORDER BY sum(wgt) DESC, l_partkey LIMIT 20
    """,
)
def q222_recency_weighted_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted popularity ranking: each sale contributes
    2^-(weeks old), so last week counts double next week — the
    cold-start recommendation fallback and trending-item signal.
    Half-life-one-week weights are EXACT powers of two clamped at
    2^-30, so the per-part sums are exact dyadic rationals
    (order-independent float addition — the q155 discipline; an
    arbitrary decay rate would make the ranking partition-order
    dependent).  "Weeks old" is calendar-agnostic elapsed weeks —
    floor(days/7) on BOTH sides (the oracle deliberately avoids
    DuckDB's date_diff('week',...), which counts ISO-Monday boundary
    crossings and diverges from floor(days/7) on any non-Sunday
    anchor; pinned by a non-Sunday-anchor test in
    tests/test_week_semantics.py).  One scalar max broadcast, one
    aggregation, top-k."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    mx = li.agg(F.max("l_shipdate").alias("m"))
    w = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey",
        F.pow(
            F.lit(2.0),
            -F.least(
                F.floor(F.datediff("m", "l_shipdate") / 7).cast("int"), F.lit(30)
            ),
        ).alias("wgt"),
    )
    return (
        w.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sales"),
            F.sum("wgt").alias("pop"),
        )
        .orderBy(F.col("pop").desc(), "l_partkey")
        .limit(20)
        .select(
            F.col("l_partkey").cast("bigint").alias("partkey"),
            "n_sales",
            F.round("pop", 6).alias("popularity"),
        )
    )


@_register(
    "q223_brand_reach",
    """
    WITH tot AS (SELECT count(DISTINCT o_custkey) AS n FROM orders),
    reach AS (
      SELECT p.p_brand AS brand,
             count(DISTINCT o.o_custkey) AS n_buyers
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p   ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    )
    SELECT brand,
           CAST(n_buyers AS BIGINT) AS n_buyers,
           round(n_buyers::DOUBLE / tot.n, 6) AS reach
    FROM reach CROSS JOIN tot
    ORDER BY n_buyers DESC, brand LIMIT 10
    """,
)
def q223_brand_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand reach (household penetration): the fraction of buying
    customers each brand touched — the CPG market-power metric that
    revenue share (q103) hides (one whale can fake share; reach
    can't).  Scale shape: one fact key join, part dim broadcast, a
    distinct-customer count per brand (HLL at 100 TB per q43), and
    the buyer total broadcast onto the 25-row brand frame."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    tot = o.agg(F.countDistinct("o_custkey").alias("n"))
    reach = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.countDistinct("o_custkey").alias("n_buyers"))
    )
    return (
        reach.crossJoin(F.broadcast(tot))
        .select(
            "brand",
            F.col("n_buyers").cast("bigint").alias("n_buyers"),
            F.round(F.col("n_buyers") / F.col("n"), 6).alias("reach"),
        )
        .orderBy(F.col("n_buyers").desc(), "brand")
        .limit(10)
    )


@_register(
    "q224_nation_seasonality_cv",
    """
    WITH nm AS (
      SELECT n.n_name AS nation,
             date_trunc('month', o.o_orderdate) AS mth,
             count(*) AS n
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT nation, count(*) AS k, sum(n) AS sn, sum(n * n) AS snn
      FROM nm GROUP BY nation
    )
    SELECT nation,
           CAST(k AS BIGINT)         AS n_months,
           round(sn::DOUBLE / k, 6)  AS mean_orders,
           round(sqrt((k * snn - sn * sn)::DOUBLE / (k * (k - 1))), 6)
               AS std_orders,
           round(sqrt((k * snn - sn * sn)::DOUBLE / (k * (k - 1)))
                 / (sn::DOUBLE / k), 6) AS cv
    FROM s WHERE k >= 2
    ORDER BY nation
    """,
)
def q224_nation_seasonality_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand-volatility profile by nation: coefficient of variation of
    monthly order counts — flat-demand markets (low CV) forecast with
    a mean, volatile ones (high CV) need the seasonal models
    (q155/q190); this query routes that decision.  Variance comes
    from the exact-integer moment identity over monthly counts (q177
    discipline, int64-safe at month granularity).  Scale shape: dims
    broadcast onto one fact pass, monthly rollup, then a 25-key
    moment aggregate."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nm = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.trunc("o_orderdate", "month").alias("mth"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = nm.groupBy("nation").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    var = (F.col("k") * F.col("snn") - F.col("sn") * F.col("sn")) / (
        F.col("k") * (F.col("k") - 1)
    )
    mean = F.col("sn") / F.col("k")
    return (
        s.where(F.col("k") >= 2)
        .select(
            "nation",
            F.col("k").cast("bigint").alias("n_months"),
            F.round(mean, 6).alias("mean_orders"),
            F.round(F.sqrt(var), 6).alias("std_orders"),
            F.round(F.sqrt(var) / mean, 6).alias("cv"),
        )
        .orderBy("nation")
    )


@_register(
    "q225_embedding_qa_gate",
    """
    WITH q AS (
      SELECT vec_id, label,
             list_sum(list_transform(range(1, 65),
               i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
                    * CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)))
                 AS norm2q
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT)    AS label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN norm2q = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_vectors,
           round(sqrt(min(norm2q)) / 10000, 6) AS min_norm,
           round(sqrt(max(norm2q)) / 10000, 6) AS max_norm
    FROM q GROUP BY label ORDER BY label
    """,
)
def q225_embedding_qa_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA gate: per label, zero-vector count and the L2-norm
    envelope — the pre-index sanity check (zero vectors poison cosine
    math with NaN; a wild norm range means unnormalized mixed batches)
    that runs before any ANN build (q18/q24) or SemDeDup pass (q114).
    Norms square-sum QUANTIZED integer dims (q162's ten-thousandths),
    so min/max/zero tests compare exact integers; only the displayed
    norm takes a sqrt.  One scan, per-row HOF fold, 10-key agg."""
    e = _t(spark, sf_dir, "embeddings")
    qd = "CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)"
    norm2q = F.expr(
        f"aggregate(transform(embedding, x -> {qd} * {qd}), 0L, (a, b) -> a + b)"
    )
    q = e.select("label", norm2q.alias("norm2q"))
    return (
        q.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.when(F.col("norm2q") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero_vectors"),
            F.round(F.sqrt(F.min("norm2q")) / 10000, 6).alias("min_norm"),
            F.round(F.sqrt(F.max("norm2q")) / 10000, 6).alias("max_norm"),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            "n_vectors",
            "n_zero_vectors",
            "min_norm",
            "max_norm",
        )
        .orderBy("label")
    )


@_register(
    "q226_jaccard_band_histogram",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
                                          i -> substr(lower(text), i, 8))) AS s
      FROM documents
    ),
    pairs AS (
      SELECT round(len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
            / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))), 6)
            AS j
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
            / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    )
    SELECT CAST(least(CAST(floor(j * 10) AS BIGINT), 9) AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY band
    """,
)
def q226_jaccard_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold-sensitivity histogram: verified pairs from the
    SHARED minhash pair artifact bucketed by Jaccard decile — the
    calibration view that picks the production dedup threshold (a fat
    0.5-0.6 band means the threshold sits on a cliff; mass at 0.9+
    means exact-dup leakage into the near-dup path).  Pure artifact
    consumer: zero pipeline work beyond a 2-column scan of the
    persisted pairs; the oracle re-brute-forces the pair set.
    Banding floors the already-rounded jaccard, so band edges are
    decimal-stable."""
    pairs = _neardup_pairs(spark, sf_dir)
    return (
        pairs.select(
            F.least(
                F.floor(F.round("jaccard", 6) * 10).cast("bigint"), F.lit(9)
            ).alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@_register(
    "q227_order_rhythm",
    """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS g
      FROM orders
    ),
    per AS (
      SELECT o_custkey, count(*) AS k, sum(g) AS sg, sum(g * g) AS sgg
      FROM gaps WHERE g IS NOT NULL GROUP BY o_custkey
      HAVING count(*) >= 5 AND sum(g) > 0
    )
    SELECT CAST(o_custkey AS BIGINT) AS custkey,
           CAST(k AS BIGINT)         AS n_gaps,
           round(sg::DOUBLE / k, 6)  AS mean_gap_days,
           round(sqrt((k * sgg - sg * sg)::DOUBLE / (k * (k - 1)))
                 / (sg::DOUBLE / k), 6) AS gap_cv
    FROM per
    ORDER BY sqrt((k * sgg - sg * sg)::DOUBLE / (k * (k - 1)))
             / (sg::DOUBLE / k) ASC, o_custkey
    LIMIT 20
    """,
)
def q227_order_rhythm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-rhythm detection: the 20 most REGULAR customers by
    coefficient of variation of inter-order gaps (low CV = metronomic
    reordering — the replenishment/subscription candidates a retention
    team automates first).  Gap variance via exact integer moments
    (q177 discipline); the CV ordering key is a deterministic function
    of exact integers.  One customer-partitioned window + same-key
    aggregate, top-k."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("g"),
    ).where(F.col("g").isNotNull())
    per = (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("g").alias("sg"),
            F.sum(F.col("g") * F.col("g")).alias("sgg"),
        )
        .where((F.col("k") >= 5) & (F.col("sg") > 0))
    )
    mean = F.col("sg") / F.col("k")
    std = F.sqrt(
        (F.col("k") * F.col("sgg") - F.col("sg") * F.col("sg")).cast("double")
        / (F.col("k") * (F.col("k") - 1))
    )
    return (
        per.select(
            F.col("o_custkey").cast("bigint").alias("custkey"),
            F.col("k").cast("bigint").alias("n_gaps"),
            F.round(mean, 6).alias("mean_gap_days"),
            (std / mean).alias("__cv"),
        )
        .orderBy(F.col("__cv").asc(), "custkey")
        .limit(20)
        .select("custkey", "n_gaps", "mean_gap_days", F.round("__cv", 6).alias("gap_cv"))
    )


@_register(
    "q228_source_signature_terms",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    st AS (
      SELECT source, t, count(*) AS n FROM tok WHERE t <> ''
      GROUP BY source, t
    ),
    stot AS (SELECT source, sum(n) AS sn FROM st GROUP BY source),
    gt AS (SELECT t, sum(n) AS gn FROM st GROUP BY t),
    gtot AS (SELECT sum(gn) AS g FROM gt),
    lift AS (
      SELECT st.source, st.t, st.n,
             (st.n::DOUBLE * gtot.g) / (stot.sn::DOUBLE * gt.gn) AS lft,
             row_number() OVER (
               PARTITION BY st.source
               ORDER BY (st.n::DOUBLE * gtot.g) / (stot.sn::DOUBLE * gt.gn)
                        DESC, st.t) AS rn
      FROM st
      JOIN stot ON stot.source = st.source
      JOIN gt ON gt.t = st.t
      CROSS JOIN gtot
      WHERE st.n >= 5
    )
    SELECT source, t AS term, CAST(n AS BIGINT) AS n_in_source,
           round(lft, 6) AS lift
    FROM lift WHERE rn <= 3
    ORDER BY source, lift DESC, term
    """,
)
def q228_source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source signature terms: the 3 most over-represented words per
    source by usage lift (share-in-source / share-in-corpus, support
    ≥ 5) — the source-fingerprint the contamination matrix (q193)
    localizes to actual vocabulary ('what makes src7 src7').  Scale
    shape: one tokenize pass to (source, term) counts; source totals
    and the term margin are broadcast-sized aggregates of that frame;
    the per-source top-3 rank partitions by source (parallel,
    WindowGroupLimit-eligible).  Lift multiplies exact integers before
    the one division — hash-stable ordering with term tiebreak."""
    tok = _t(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).where(F.col("t") != "")
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    st = st.localCheckpoint(eager=True)  # three readers below
    stot = st.groupBy("source").agg(F.sum("n").alias("sn"))
    gt = st.groupBy("t").agg(F.sum("n").alias("gn"))
    gtot = gt.agg(F.sum("gn").alias("g"))
    lift = (
        st.where(F.col("n") >= 5)
        .join(F.broadcast(stot), "source")
        .join(gt, "t")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            "t",
            "n",
            ((F.col("n") * F.col("g")) / (F.col("sn") * F.col("gn"))).alias(
                "lft"
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("lft").desc(), "t")
    return (
        lift.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "source",
            F.col("t").alias("term"),
            F.col("n").cast("bigint").alias("n_in_source"),
            F.round("lft", 6).alias("lift"),
        )
        .orderBy("source", F.col("lift").desc(), "term")
    )


@_register(
    "q229_reorder_probability",
    """
    WITH firsts AS (
      SELECT o_custkey,
             min_by(CAST(round(o_totalprice * 100) AS BIGINT),
                    date_diff('day', DATE '1990-01-01', o_orderdate)
                    * 10000000000000 + o_orderkey) AS first_c,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    thr AS (
      SELECT quantile_cont(first_c, 0.25) AS t1,
             quantile_cont(first_c, 0.5)  AS t2,
             quantile_cont(first_c, 0.75) AS t3
      FROM firsts
    ),
    banded AS (
      SELECT 1 + (first_c > t1)::INT + (first_c > t2)::INT
               + (first_c > t3)::INT AS band,
             CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END AS reordered
      FROM firsts CROSS JOIN thr
    )
    SELECT CAST(band AS BIGINT)           AS first_order_band,
           CAST(count(*) AS BIGINT)       AS n_customers,
           CAST(sum(reordered) AS BIGINT) AS n_reordered,
           round(sum(reordered)::DOUBLE / count(*), 6) AS reorder_rate
    FROM banded GROUP BY band
    """,
)
def q229_reorder_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder probability by first-order value quartile: does a bigger
    first basket predict a second order — the acquisition-targeting
    read that q215's AOV trend feeds into.  First order picked by the
    scalar (days·1e13 + orderkey) min_by composite (q215 discipline —
    orderkey-safe to ~6e11 ≈ sf 100k, see q215 docstring for bounds),
    quartile bands from broadcast exact thresholds (q145 discipline);
    rates exact-integer.  One customer-key aggregate end-to-end."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    ordkey = (
        F.datediff("o_orderdate", F.lit("1990-01-01").cast("date")).cast("bigint")
        * 10000000000000
        + F.col("o_orderkey")
    )
    firsts = o.groupBy("o_custkey").agg(
        F.min_by("c", ordkey).alias("first_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    thr = firsts.agg(
        F.expr("percentile(first_c, 0.25)").alias("t1"),
        F.expr("percentile(first_c, 0.5)").alias("t2"),
        F.expr("percentile(first_c, 0.75)").alias("t3"),
    )
    banded = firsts.crossJoin(F.broadcast(thr)).select(
        (
            1
            + (F.col("first_c") > F.col("t1")).cast("int")
            + (F.col("first_c") > F.col("t2")).cast("int")
            + (F.col("first_c") > F.col("t3")).cast("int")
        ).alias("band"),
        F.when(F.col("n_orders") >= 2, 1).otherwise(0).alias("reordered"),
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("reordered").cast("bigint").alias("n_reordered"),
        F.round(F.sum("reordered") / F.count(F.lit(1)), 6).alias("reorder_rate"),
    ).select(
        F.col("band").cast("bigint").alias("first_order_band"),
        "n_customers",
        "n_reordered",
        "reorder_rate",
    )


@_register(
    "q230_weekend_share_drift",
    """
    WITH y AS (
      SELECT year(o_orderdate) AS yr,
             sum(CASE WHEN dayofweek(o_orderdate) IN (0, 6)
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS wk_c,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS tot_c
      FROM orders GROUP BY yr
    )
    SELECT CAST(yr AS BIGINT) AS year,
           round(wk_c::DOUBLE / tot_c, 6) AS weekend_share,
           round(wk_c::DOUBLE / tot_c
                 - lag(wk_c::DOUBLE / tot_c) OVER (ORDER BY yr), 6)
               AS yoy_delta
    FROM y ORDER BY yr
    """,
)
def q230_weekend_share_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend revenue-share drift by year: the behavioral-mix trend
    (channel/habit shifts show up as weekend share moving) with
    year-over-year deltas.  Spark dayofweek is 1=Sunday vs DuckDB
    0=Sunday — the Spark side tests membership in {1,7} to pin the
    same weekend set (q157's lesson).  One conditional-aggregate pass,
    then a lag on the 7-row yearly frame; shares exact-integer."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.dayofweek("o_orderdate").alias("dw"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    y = o.groupBy("yr").agg(
        F.sum(F.when(F.col("dw").isin(1, 7), F.col("c")).otherwise(0)).alias(
            "wk_c"
        ),
        F.sum("c").alias("tot_c"),
    )
    share = F.col("wk_c") / F.col("tot_c")
    w = Window.orderBy("yr")
    return y.select(
        F.col("yr").cast("bigint").alias("year"),
        F.round(share, 6).alias("weekend_share"),
        F.round(share - F.lag(share).over(w), 6).alias("yoy_delta"),
    ).orderBy("year")
