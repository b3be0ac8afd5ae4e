"""Corpus-level training-data ops: n-grams, splits, PMI, Zipf, funnels, quality clusters (q123-q173).

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
# Round-5 additions: corpus-level training-data ops (repeated n-grams,
# deterministic splits, quality-weighted canonicalization, OOV scoring)
# ---------------------------------------------------------------------------


@_register(
    "q123_repeated_ngrams",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, g.ng
      FROM toks,
           unnest(CASE WHEN len(t) >= 5 THEN
                    list_transform(range(1, len(t) - 3),
                                   i -> array_to_string(list_slice(t, i, i + 4), ' '))
                  ELSE [] END) AS g(ng)
    ),
    per_doc AS (
      SELECT ng, doc_id, count(*) AS n_occ FROM grams GROUP BY ng, doc_id
    ),
    agg AS (
      SELECT ng, count(*) AS n_docs, sum(n_occ) AS n_occurrences
      FROM per_doc GROUP BY ng
    )
    SELECT ng,
           CAST(n_docs AS BIGINT)        AS n_docs,
           CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM agg WHERE n_docs >= 3
    ORDER BY n_docs DESC, n_occurrences DESC, ng LIMIT 20
    """,
)
def q123_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated n-gram mining — the signal behind exact-
    substring train-set dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): word 5-grams appearing in ≥3
    distinct documents, ranked by document frequency.  Scale shape: the
    n-gram stream never materializes globally — two hash aggregations
    with map-side partial combine ((ngram, doc) occurrence counts, then
    per-ngram doc counts), and only the ≥3-doc sliver reaches the final
    top-k.  The 5-gram build is a pure Catalyst HOF (slice+concat_ws
    over a sequence), no UDF; sequence() is guarded by size>=5 (Spark's
    sequence DESCENDS when the bound is < 1)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "").alias(
            "t"
        ),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 5,
                F.expr(
                    "transform(sequence(1, size(t) - 4), "
                    "          i -> concat_ws(' ', slice(t, i, 5)))"
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
        ).alias("ng"),
    )
    per_doc = grams.groupBy("ng", "doc_id").agg(F.count(F.lit(1)).alias("n_occ"))
    agg = per_doc.groupBy("ng").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_occ").alias("n_occurrences")
    )
    return (
        agg.where(F.col("n_docs") >= 3)
        .orderBy(F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("ng"))
        .limit(20)
        .select(
            "ng",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
        )
    )


@_register(
    "q124_hash_split",
    """
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'train'
                  WHEN (doc_id * 2654435761) % 1000 < 950 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT)    AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split, lang
    """,
)
def q124_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — the split must be a pure
    function of the stable document id (never random()/row order) so it
    is reproducible across runs, engines and re-partitioning, and any
    doc's split is computable without scanning the corpus.  90/5/5 via
    the same EXACT-INTEGER multiplicative hash as q115's temperature
    sampling (Knuth 2654435761): zero floats, bit-identical across
    engines, evaluated map-side as a scan-level projection.  Output is
    the split×lang audit table (counts + exact char totals) a pipeline
    logs before training."""
    d = _t(spark, sf_dir, "documents")
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000))
    split = (
        F.when(u < 900, F.lit("train")).when(u < 950, F.lit("val")).otherwise(
            F.lit("test")
        )
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@_register(
    "q125_quality_canonical_clusters",
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
    nodes AS (SELECT DISTINCT s AS doc_id FROM edges),
    reach AS (
      SELECT doc_id AS src, doc_id AS dst FROM nodes
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s
    ),
    comp AS (
      SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    ),
    t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
             length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio
      FROM documents
    ),
    quality AS (
      SELECT doc_id,
             round((CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.5 END)
                   * (1.0 - least(punct_ratio * 2, 1.0)), 6) AS q
      FROM (
        SELECT doc_id,
               list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                 / greatest(len(toks), 1) AS mtl,
               punct_ratio
        FROM t
      )
    ),
    ranked AS (
      SELECT c.component, c.doc_id, q.q,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.q DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component) AS size
      FROM comp c JOIN quality q USING (doc_id)
    )
    SELECT component,
           CAST(size AS BIGINT) AS size,
           doc_id               AS canonical_id,
           q                    AS canonical_quality
    FROM ranked WHERE rn = 1
    """,
)
def q125_quality_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted canonicalization: within each near-dup cluster
    keep the HIGHEST-quality member (q108 keeps the min id; a production
    scrub keeps the best document).  Composition of three persisted/
    shared stages — the materialized minhash pair artifact, distributed
    connected components, and the deterministic quality heuristic — so
    the marginal cost over q70/q108 is one per-cluster window on cluster
    rows only (clusters are a sliver of the corpus).  Ties break to the
    lower doc_id in both engines."""
    from stock_ops_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs)  # pair nodes only: clusters of size >= 2
    q = d.select("doc_id", TXT.quality_score(F.col("text")).alias("q"))
    j = comp.join(q, comp.node == q.doc_id).select("component", "doc_id", "q")
    w = Window.partitionBy("component").orderBy(F.col("q").desc(), F.col("doc_id"))
    sizes = j.groupBy("component").agg(F.count(F.lit(1)).cast("bigint").alias("size"))
    best = j.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return best.join(sizes, "component").select(
        "component",
        "size",
        F.col("doc_id").alias("canonical_id"),
        F.col("q").alias("canonical_quality"),
    )


@_register(
    "q126_oov_ratio",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    tok AS (SELECT doc_id, w.w FROM toks, unnest(t) AS w(w)),
    vocab AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    w100 AS (SELECT w FROM vocab ORDER BY n DESC, w LIMIT 100),
    per_doc AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok t LEFT JOIN w100 v ON t.w = v.w
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT)    AS n_oov,
           round(n_oov::DOUBLE / n_tokens, 6) AS oov_ratio
    FROM per_doc
    ORDER BY round(n_oov::DOUBLE / n_tokens, 6) DESC, doc_id LIMIT 20
    """,
)
def q126_oov_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary scoring — the two-pass corpus-dependent quality
    gate (unlike q25/q92's per-row heuristics): pass 1 builds the global
    top-100 token vocabulary, pass 2 scores each document by the fraction
    of its tokens outside it; worst 20 surface (gibberish / wrong-corpus
    detection, the cheap stand-in for LM-perplexity filtering).  Scale
    shape: the vocabulary is a 100-row broadcast against the token
    stream, per-doc counts partially aggregate map-side, and the ratio is
    ONE division of two exact integers (IEEE-identical in both engines —
    no float-sum ordering hazard), so ordering by the rounded ratio +
    doc_id is bit-deterministic."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "").alias(
            "t"
        ),
    )
    tok = toks.select("doc_id", F.explode("t").alias("w"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    w100 = (
        vocab.orderBy(F.col("n").desc(), F.col("w"))
        .limit(100)
        .select("w", F.lit(1).alias("in_v"))
    )
    per_doc = (
        tok.join(F.broadcast(w100), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    ratio = F.round(F.col("n_oov") / F.col("n_tokens"), 6)
    return (
        per_doc.orderBy(ratio.desc(), F.col("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_oov").cast("bigint").alias("n_oov"),
            ratio.alias("oov_ratio"),
        )
    )


@_register(
    "q127_term_cooccurrence_pmi",
    """
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                       x -> x <> '')) AS t
      FROM documents
    ),
    tok AS (SELECT doc_id, w.w FROM toks, unnest(t) AS w(w)),
    df AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    vocab AS (SELECT w, n FROM df ORDER BY n DESC, w LIMIT 50),
    dt AS (SELECT t.doc_id, t.w FROM tok t JOIN vocab v USING (w)),
    pairs AS (
      SELECT a.w AS tok_a, b.w AS tok_b
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.w < b.w
    ),
    pc AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM pairs GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tok_a, tok_b,
           CAST(n_ab AS BIGINT) AS n_ab,
           round(ln(n_ab * n_docs / (va.n * vb.n)), 6) AS pmi
    FROM pc
    JOIN vocab va ON va.w = pc.tok_a
    JOIN vocab vb ON vb.w = pc.tok_b
    CROSS JOIN n
    WHERE n_ab >= 5
    ORDER BY n_ab DESC, tok_a, tok_b
    LIMIT 30
    """,
)
def q127_term_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus co-occurrence statistics: pointwise mutual information of
    term pairs sharing a document, restricted to the global top-50
    vocabulary (the classic collocation / topic-signal measure used to
    audit corpus composition before training).  Scale shape: the vocab
    rides as a 1-row broadcast ARRAY intersected with each doc's
    distinct-token array in the scan projection, so the per-doc vocab
    set never touches a shuffle; pairs are generated map-side by a pure
    Catalyst HOF over that sorted set (<=C(50,2) per doc, typically a
    handful), so the only shuffles are the two hash aggregations (doc
    frequency, pair counts) — the corpus-wide token pair space is never
    materialized.  PMI is one ln() of a ratio of exact integers
    (IEEE-identical both engines)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("t"),
    )
    tok = toks.select("doc_id", F.explode("t").alias("w"))
    df_tok = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    vocab = df_tok.orderBy(F.col("n").desc(), F.col("w")).limit(50)
    # r11 (§2): the former explode ⋈ broadcast-vocab → groupBy(doc_id)
    # collect_set reshuffled the whole filtered token stream by doc_id
    # just to rebuild a per-doc set the scan-side array already holds.
    # array_intersect(t, vocab) against the 1-row broadcast vocab ARRAY
    # computes the same sorted set map-side (t is distinct per doc), so
    # the doc_id shuffle and the second explode pass disappear.
    vocab_arr = vocab.agg(F.collect_list("w").alias("vs"))
    # The repartition keeps the pair explosion (<=C(50,2) rows per doc)
    # off the scan tasks: a coarse-split input (one row group) would
    # otherwise serialize it (measured 15.3 s on 2 scan tasks vs 2.8 s
    # post-exchange at sf1).  It shuffles ONE bounded array per doc —
    # byte-parity with the partial collect_set sets the old shape
    # exchanged on the same key — and AQE sizes the partition count.
    per_doc = (
        toks.crossJoin(F.broadcast(vocab_arr))
        .select("doc_id", F.sort_array(F.array_intersect("t", "vs")).alias("vw"))
        .repartition("doc_id")
    )
    pairs = per_doc.select(
        F.explode(
            F.expr(
                "flatten(transform(vw, (x, i) ->"
                "  transform(slice(vw, i + 2, size(vw)),"
                "            y -> struct(x AS tok_a, y AS tok_b))))"
            )
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    pc = pairs.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("n_ab"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    va = vocab.select(F.col("w").alias("tok_a"), F.col("n").alias("n_a"))
    vb = vocab.select(F.col("w").alias("tok_b"), F.col("n").alias("n_b"))
    return (
        pc.where(F.col("n_ab") >= 5)
        .join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(F.col("n_ab") * F.col("n_docs") / (F.col("n_a") * F.col("n_b"))),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("n_ab").desc(), "tok_a", "tok_b")
        .limit(30)
    )


@_register(
    "q128_market_share",
    """
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_12'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 4)                          AS nation_revenue,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)  AS total_revenue,
           round(100.0 * sum(CASE WHEN n2.n_name = 'NATION_12'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share_pct
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    GROUP BY 1
    """,
)
def q128_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): for orders placed by
    customers in one region, the per-year revenue share supplied by one
    nation — a 6-table star join with a conditional aggregate.  Scale
    shape: every dimension (customer, supplier, nation x2, region) is
    explicitly broadcast, so the ONLY shuffle is the lineitem-orders
    key join; the region filter prunes customers inside the broadcast
    build side, and the share is computed from the same two partial
    sums (one conditional) in a single aggregation pass."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n1 = n.alias("n1")
    n2 = n.alias("n2")
    cust_asia = (
        c.join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey")
    ).select("s_suppkey", F.col("n2.n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_12", rev).otherwise(F.lit(0.0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(nation_rev), 4).alias("nation_revenue"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
            F.round(100.0 * F.sum(nation_rev) / F.sum(rev), 4).alias("mkt_share_pct"),
        )
    )


@_register(
    "q129_containment_neardup",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
                                          i -> substr(lower(text), i, 8))) AS s
      FROM documents
    ),
    sz AS (SELECT doc_id, s, len(s) AS z FROM sh)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS BIGINT)
                                                                  AS n_shared,
           round(len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
                 / least(a.z, b.z), 6)                            AS containment
    FROM sz a JOIN sz b ON a.doc_id < b.doc_id
    WHERE 5 * len(list_filter(a.s, x -> list_contains(b.s, x)))
          >= 4 * least(a.z, b.z)
    """,
)
def q129_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection by Jaccard CONTAINMENT
    |A∩B| / min(|A|,|B|) >= 0.8 over 8-char shingles — catches a short
    document embedded in a long one (quotes, boilerplate wrappers),
    which symmetric-Jaccard MinHash (q21) structurally misses because
    the union term dilutes the score.  Scale shape is an exact
    prefix-filter set-containment join (PPJoin-family, Xiao et al.
    2008): if B holds >=ceil(0.8|A|) of A's shingles it misses at most
    |A|-ceil(0.8|A|), so ANY |A|-ceil(0.8|A|)+1 shingles of A pigeonhole
    at least one hit — each doc emits only that many candidates keyed by
    its globally RAREST shingles (ordered by corpus document frequency,
    which minimizes posting-list fan-out), joined against the full
    shingle inverted index, then candidates are verified exactly.
    Recall is provably 100%, so the result equals the quadratic oracle.
    The threshold compare is pure-integer (5*inter >= 4*min) — no float
    boundary — and ceil(0.8*z) is (4z+4) DIV 5: integer-exact, immune to
    IEEE ceil traps (e.g. float ceil(9/11 · 77) = 64; exact 63).
    Implementation: operators/dedup.py::containment_pairs over a
    dictionary-encoded shingle space, served through the persisted pair
    ARTIFACT (containment_pairs_cached — same fit-once-read-many
    discipline as the minhash pairs/centroids/PageRank artifacts: the
    full corpus pass runs once per source version, every later consumer
    reads the tiny pair table).  Property tests pin brute-force equality
    and artifact invalidation (tests/test_containment.py)."""
    from stock_ops_spark.operators.dedup import containment_pairs_cached

    d = _t(spark, sf_dir, "documents")
    return containment_pairs_cached(
        d,
        source_path=catalog.table_path(sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        threshold_num=4,
        threshold_den=5,
        n=8,
    )


@_register(
    "q130_zipf_slope",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    tok AS (SELECT w.w FROM toks, unnest(t) AS w(w)),
    freq AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, w) AS r FROM freq
    )
    SELECT CAST(count(*) AS BIGINT)                 AS n_terms,
           CAST(sum(n) AS BIGINT)                   AS n_tokens,
           round(regr_slope(ln(n), ln(r)), 4)       AS zipf_slope,
           round(regr_intercept(ln(n), ln(r)), 4)   AS zipf_intercept,
           round(regr_r2(ln(n), ln(r)), 6)          AS r2
    FROM ranked WHERE r <= 1000
    """,
)
def q130_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-distribution health check: fit log(freq) ~ log(rank)
    over the top-1000 terms (Zipf's law predicts slope ≈ -1; strong
    deviation flags boilerplate-heavy or truncated corpora — a standard
    pre-training diagnostic).  Scale shape: term counting partially
    aggregates map-side; the top-1000 selection is a distributed
    TakeOrderedAndProject (never a single-partition global sort of the
    vocabulary), and only those 1000 rows reach the rank window and the
    one-pass regr_* aggregates."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    top = freq.orderBy(F.col("n").desc(), F.col("w")).limit(1000)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("w")))
    )
    y, x = F.log(F.col("n")), F.log(F.col("r"))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.round(F.regr_slope(y, x), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


@_register(
    "q131_scrub_funnel",
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
    nodes AS (SELECT DISTINCT s AS doc_id FROM edges),
    reach AS (
      SELECT doc_id AS src, doc_id AS dst FROM nodes
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s
    ),
    comp AS (
      SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    ),
    fpr AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    ex AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM fpr
    ),
    t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
             length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio
      FROM documents
    ),
    quality AS (
      SELECT doc_id,
             round((CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.5 END)
                   * (1.0 - least(punct_ratio * 2, 1.0)), 6) AS q
      FROM (
        SELECT doc_id,
               list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                 / greatest(len(toks), 1) AS mtl,
               punct_ratio
        FROM t
      )
    ),
    flags AS (
      SELECT d.doc_id,
             (e.rn = 1)                                           AS keep_exact,
             (c.component IS NULL OR c.component = d.doc_id)      AS keep_nd,
             (q.q >= 0.5)                                         AS keep_q
      FROM documents d
      JOIN ex e USING (doc_id)
      LEFT JOIN comp c USING (doc_id)
      JOIN quality q USING (doc_id)
    ),
    agg AS (
      SELECT count(*) AS n_total,
             sum(CASE WHEN keep_exact THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN keep_exact AND keep_nd THEN 1 ELSE 0 END) AS n2,
             sum(CASE WHEN keep_exact AND keep_nd AND keep_q THEN 1 ELSE 0 END) AS n3
      FROM flags
    )
    SELECT '0_total' AS stage, CAST(n_total AS BIGINT) AS n_docs,
           round(n_total::DOUBLE / n_total, 6) AS pct_of_total FROM agg
    UNION ALL
    SELECT '1_exact_dedup', CAST(n1 AS BIGINT),
           round(n1::DOUBLE / n_total, 6) FROM agg
    UNION ALL
    SELECT '2_near_dedup', CAST(n2 AS BIGINT),
           round(n2::DOUBLE / n_total, 6) FROM agg
    UNION ALL
    SELECT '3_quality', CAST(n3 AS BIGINT),
           round(n3::DOUBLE / n_total, 6) FROM agg
    """,
)
def q131_scrub_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scrub FUNNEL REPORT — the one table a production data
    pipeline logs per run: how many documents survive each cleaning
    stage (exact dedup by content fingerprint -> near-dup cluster
    canonicalization -> quality gate), as counts and fractions of the
    raw corpus.  Composes three already-amortized components — the md5
    fingerprint (q15), the materialized minhash pair ARTIFACT + min-label
    connected components (q70/q108: canonical member = min doc_id of its
    cluster; docs in no cluster keep themselves), and the deterministic
    quality score (q25/q125) at gate >= 0.5 — so the marginal cost is one
    doc-level flag projection and a single 4-counter aggregate (the
    stage rows are stack()ed from ONE pass; the corpus is scanned once
    beyond the shared artifacts).  All fractions are ratios of exact
    integers — no float-sum hazard."""
    from stock_ops_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        TXT.fingerprint_md5(F.col("text")).alias("fp"),
        TXT.quality_score(F.col("text")).alias("q"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = base.withColumn("keep_exact", F.row_number().over(w) == 1)
    pairs = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    flagged = flagged.join(comp, "doc_id", "left")
    keep_nd = F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    keep_q = F.col("q") >= 0.5
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        one(F.col("keep_exact")).alias("n1"),
        one(F.col("keep_exact") & keep_nd).alias("n2"),
        one(F.col("keep_exact") & keep_nd & keep_q).alias("n3"),
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " '0_total',       CAST(n_total AS BIGINT), round(CAST(n_total AS DOUBLE) / n_total, 6),"
            " '1_exact_dedup', CAST(n1 AS BIGINT),      round(CAST(n1 AS DOUBLE) / n_total, 6),"
            " '2_near_dedup',  CAST(n2 AS BIGINT),      round(CAST(n2 AS DOUBLE) / n_total, 6),"
            " '3_quality',     CAST(n3 AS BIGINT),      round(CAST(n3 AS DOUBLE) / n_total, 6)"
            ") AS (stage, n_docs, pct_of_total)"
        )
    )


@_register(
    "q132_funnel3",
    """
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    agg AS (
      SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_all,
             (SELECT count(*) FROM t1) AS n1,
             (SELECT count(*) FROM t2) AS n2,
             (SELECT count(*) FROM t3) AS n3
    )
    SELECT '0_all_users' AS stage, CAST(n_all AS BIGINT) AS n_users,
           round(n_all::DOUBLE / n_all, 6) AS pct_of_all FROM agg
    UNION ALL
    SELECT '1_view', CAST(n1 AS BIGINT), round(n1::DOUBLE / n_all, 6) FROM agg
    UNION ALL
    SELECT '2_view_click', CAST(n2 AS BIGINT), round(n2::DOUBLE / n_all, 6) FROM agg
    UNION ALL
    SELECT '3_view_click_purchase', CAST(n3 AS BIGINT),
           round(n3::DOUBLE / n_all, 6) FROM agg
    """,
)
def q132_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ORDER three-step funnel (view -> click -> purchase): a user
    converts step k only with an event strictly after their step-(k-1)
    conversion time — the sequencing q117's single-window conversion and
    q50/q59's attribution joins don't express.  Scale shape: three
    map-side-combined per-user min() aggregations, each joined to the
    (shrinking) previous stage — stage frames are user-level and small,
    so the joins broadcast; the event stream is scanned per stage with
    the event_type filter pushed to the scan.  Fractions are ratios of
    exact integers."""
    ev = _t(spark, sf_dir, "events")
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(t1), "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(t2), "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_all = ev.agg(F.countDistinct("user_id").alias("n_all"))
    n1 = t1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = t2.agg(F.count(F.lit(1)).alias("n2"))
    n3 = t3.agg(F.count(F.lit(1)).alias("n3"))
    agg = (
        n_all.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " '0_all_users',           CAST(n_all AS BIGINT), round(CAST(n_all AS DOUBLE) / n_all, 6),"
            " '1_view',                CAST(n1 AS BIGINT),    round(CAST(n1 AS DOUBLE) / n_all, 6),"
            " '2_view_click',          CAST(n2 AS BIGINT),    round(CAST(n2 AS DOUBLE) / n_all, 6),"
            " '3_view_click_purchase', CAST(n3 AS BIGINT),    round(CAST(n3 AS DOUBLE) / n_all, 6)"
            ") AS (stage, n_users, pct_of_all)"
        )
    )


@_register(
    "q133_scd2_value_bands",
    """
    WITH p AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value / 100) AS BIGINT) AS state
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    marked AS (
      SELECT user_id, ts, event_id, state,
             lag(state) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_state
      FROM p
    ),
    changes AS (
      SELECT user_id, ts, state FROM marked
      WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
                             '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00')   AS valid_to,
           CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM changes
    """,
)
def q133_scd2_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (SCD type 2) snapshot build — the
    change-data-capture shape every warehouse ingest needs: collapse a
    per-user event stream into validity intervals of its derived state
    (here the purchase-value band, floor(value/100)), keeping only rows
    where the state CHANGES, with [valid_from, valid_to) stitched via
    lead() and an open interval for the current state.  Scale shape: ONE
    exchange on user_id serves both window passes (lag for change
    detection, lead for interval close) — the second window rides the
    first's partitioning; ties broken by event_id so the interval
    boundaries are deterministic.  floor(value/100) is a single IEEE op
    (engine-identical); timestamps are emitted as formatted strings."""
    p = (
        _t(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") / 100).cast("bigint").alias("state"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = p.withColumn("prev_state", F.lag("state").over(w))
    changes = marked.where(
        F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
    ).select("user_id", "ts", "state")
    w2 = Window.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "state",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"), F.lit("9999-12-31 00:00:00")
        ).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("bigint").alias("is_current"),
    )


@_register(
    "q134_copurchase_triangles",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pp AS (
      SELECT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a
      JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS (SELECT pa, pb FROM pp GROUP BY pa, pb HAVING count(*) >= 2),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT pa AS node FROM e UNION ALL SELECT pb FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM e x JOIN e y ON x.pb = y.pa JOIN e z ON z.pa = x.pa AND z.pb = y.pb
    ),
    agg AS (
      SELECT (SELECT count(*) FROM deg)                         AS n_nodes,
             (SELECT count(*) FROM e)                           AS n_edges,
             (SELECT sum((d * (d - 1)) // 2) FROM deg)          AS n_wedges,
             (SELECT n_triangles FROM tri)                      AS n_triangles
    )
    SELECT CAST(n_nodes AS BIGINT)     AS n_nodes,
           CAST(n_edges AS BIGINT)     AS n_edges,
           CAST(n_wedges AS BIGINT)    AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           round(3.0 * n_triangles / n_wedges, 6) AS transitivity
    FROM agg
    """,
)
def q134_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting + global transitivity on the part-part
    co-purchase graph — the third classic distributed graph kernel next
    to connected components (q70) and PageRank (q106).  Edges are part
    pairs co-occurring in >= 2 orders (the support filter separates
    affinity from one-off noise AND keeps the graph sparse: ~4k edges at
    every SF vs ~1.2M unfiltered at sf0.1).  Scale shape: the only heavy
    stage is the per-order pair self-join of lineitem (bounded by
    C(items-per-order, 2)); the edge list after support filtering is
    small, so the wedge-close join runs on broadcast inputs, and the
    a<b<c id orientation counts each triangle exactly once.
    Transitivity = 3*triangles / wedges from exact integers.  The edge
    list is served from the shared co-purchase ARTIFACT
    (graph.copurchase_edges_cached — one per-order pair join per corpus
    version, read by q134/q137/q141); w counts DISTINCT orders, so a
    part duplicated inside one order can't fake support."""
    from stock_ops_spark.operators.graph import copurchase_edges_cached

    e = copurchase_edges_cached(
        _t(spark, sf_dir, "lineitem"),
        source_path=catalog.table_path(sf_dir, "lineitem"),
        support=2,
    ).select("pa", "pb")
    deg = (
        e.select(F.col("pa").alias("node"))
        .union(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    tri = (
        x.join(y, F.col("x.pb") == F.col("y.pa"))
        .join(
            z,
            (F.col("z.pa") == F.col("x.pa")) & (F.col("z.pb") == F.col("y.pb")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    agg = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.expr("(d * (d - 1)) DIV 2")).alias("n_wedges"),
        )
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(tri))
    )
    return agg.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_wedges").cast("bigint").alias("n_wedges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
            "transitivity"
        ),
    )


@_register(
    "q135_epoch_scoped_spend",
    """
    WITH ue AS (
      SELECT user_id, ts, event_id, event_type, value FROM events
      WHERE event_type IN ('signup', 'purchase')
    ),
    marked AS (
      SELECT user_id, event_type, value,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS epoch
      FROM ue
    )
    SELECT user_id,
           CAST(epoch AS BIGINT) AS epoch,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                                 AS n_purchases,
           round(sum(CASE WHEN event_type = 'purchase' THEN value
                          ELSE 0 END), 2) AS total_value
    FROM marked GROUP BY user_id, epoch
    """,
)
def q135_epoch_scoped_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-RESET running aggregate: per-user purchase totals that
    reset at every signup event — the 'counter with resets' shape
    (session-scoped balances, odometer resets, campaign-epoch spend)
    that plain windows can't express without the marker trick: a
    cumulative count of reset markers over the interleaved event stream
    partitions the timeline into epochs, and the aggregate then groups
    by (user, epoch).  Scale shape: ONE exchange on user_id serves the
    marker window, and the epoch aggregation rides it map-side (the
    groupBy keys are a superset of the window partition key); the
    event_type IN filter is pushed to the scan."""
    ue = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "ts", "event_id", "event_type", "value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ue.withColumn(
        "epoch",
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).over(w),
    )
    is_p = F.col("event_type") == "purchase"
    return marked.groupBy("user_id", F.col("epoch").cast("bigint").alias("epoch")).agg(
        F.sum(F.when(is_p, 1).otherwise(0)).cast("bigint").alias("n_purchases"),
        F.round(F.sum(F.when(is_p, F.col("value")).otherwise(0.0)), 2).alias(
            "total_value"
        ),
    )


@_register(
    "q136_ship_latency_percentiles",
    """
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)          AS n_items,
           round(avg(days), 6)               AS avg_days,
           round(quantile_cont(days, 0.5), 6)  AS p50,
           round(quantile_cont(days, 0.9), 6)  AS p90,
           round(quantile_cont(days, 0.99), 6) AS p99,
           CAST(max(days) AS BIGINT)         AS max_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def q136_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency SLA matrix: exact interpolated percentiles
    of the per-lineitem fulfillment latency (days between order and
    ship) per order priority — the operational latency-distribution
    report (p50/p90/p99 tail) next to q34's value percentiles.  The
    latencies are exact integers (day diffs), so the interpolated
    quantiles are exact small fractions and avg is a ratio of exact
    integers — no float-sum hazard anywhere.  Scale shape: one
    lineitem-orders key join (the orders side carries only 2 columns),
    one aggregation; at 100 TB the exact percentile swaps for
    approx_percentile per q34's note."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.avg("days"), 6).alias("avg_days"),
        F.round(F.expr("percentile(days, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(days, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(days, 0.99)"), 6).alias("p99"),
        F.max("days").cast("bigint").alias("max_days"),
    )


@_register(
    "q137_basket_rules",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
    item AS (SELECT l_partkey AS p, count(*) AS n_p FROM op GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, w, ia.n_p AS n_ante, ib.n_p AS n_cons
      FROM pair JOIN item ia ON ia.p = pair.pa JOIN item ib ON ib.p = pair.pb
      UNION ALL
      SELECT pb, pa, w, ib.n_p, ia.n_p
      FROM pair JOIN item ia ON ia.p = pair.pa JOIN item ib ON ib.p = pair.pb
    )
    SELECT antecedent, consequent,
           CAST(w AS BIGINT)                              AS support_orders,
           round(w::DOUBLE / n_ante, 6)                   AS confidence,
           round(w::DOUBLE * n_orders / (n_ante * n_cons), 6) AS lift
    FROM rules CROSS JOIN n
    ORDER BY w DESC, antecedent, consequent
    LIMIT 40
    """,
)
def q137_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (Apriori level 2): directed
    part->part rules with support (co-orders), confidence
    P(consequent|antecedent) and lift — the classic co-purchase
    recommendation primitive on the same support>=2 pair base as q134's
    graph.  Scale shape: the only heavy stage is the per-order pair
    self-join (bounded by C(items-per-order, 2) after the DISTINCT
    projection); item counts and the order total broadcast onto the
    small rule set, and all three metrics are ratios of exact integers.
    Top-k ordered by integer support with full id tiebreaks."""
    from stock_ops_spark.operators.graph import copurchase_edges_cached

    op = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = op.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_p")
    )
    # pair weights come from the shared co-purchase artifact (one heavy
    # per-order pair join per corpus version, read by q134/q137/q141)
    pair = copurchase_edges_cached(
        _t(spark, sf_dir, "lineitem"),
        source_path=catalog.table_path(sf_dir, "lineitem"),
        support=2,
    )
    ia = item.select(F.col("p").alias("pa"), F.col("n_p").alias("n_a"))
    ib = item.select(F.col("p").alias("pb"), F.col("n_p").alias("n_b"))
    joined = pair.join(F.broadcast(ia), "pa").join(F.broadcast(ib), "pb")
    fwd = joined.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "w",
        F.col("n_a").alias("n_ante"),
        F.col("n_b").alias("n_cons"),
    )
    rev = joined.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        "w",
        F.col("n_b").alias("n_ante"),
        F.col("n_a").alias("n_cons"),
    )
    return (
        fwd.union(rev)
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("w").cast("bigint").alias("support_orders"),
            F.round(F.col("w") / F.col("n_ante"), 6).alias("confidence"),
            F.round(
                F.col("w") * F.col("n_orders") / (F.col("n_ante") * F.col("n_cons")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("support_orders").desc(), "antecedent", "consequent")
        .limit(40)
    )


@_register(
    "q138_purchase_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT user_id, d,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days
    ),
    islands AS (
      SELECT user_id, d - CAST(rn AS INT) AS anchor, count(*) AS streak
      FROM ranked GROUP BY user_id, d - CAST(rn AS INT)
    ),
    best AS (
      SELECT user_id,
             max(streak)   AS longest_streak,
             sum(streak)   AS n_active_days
      FROM islands GROUP BY user_id
    )
    SELECT user_id,
           CAST(longest_streak AS BIGINT) AS longest_streak,
           CAST(n_active_days AS BIGINT)  AS n_active_days
    FROM best
    ORDER BY longest_streak DESC, n_active_days DESC, user_id
    LIMIT 50
    """,
)
def q138_purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of CONSECUTIVE active days per user
    (streak detection — retention/habit analytics), via the classic
    date-minus-row_number anchor: consecutive days share an anchor, so
    islands fall out of a plain groupBy with no self-join or recursion.
    Scale shape: one exchange on user_id serves the distinct-day
    dedup, the rank window AND the island/best aggregations (the keys
    all refine user_id); top-k is a distributed TakeOrderedAndProject
    on integer columns with a full tiebreak."""
    days = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = (
        days.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id", F.date_sub(F.col("d"), F.col("rn")).alias("anchor"))
        .agg(F.count(F.lit(1)).alias("streak"))
    )
    best = islands.groupBy("user_id").agg(
        F.max("streak").cast("bigint").alias("longest_streak"),
        F.sum("streak").cast("bigint").alias("n_active_days"),
    )
    return best.orderBy(
        F.col("longest_streak").desc(), F.col("n_active_days").desc(), "user_id"
    ).limit(50)


@_register(
    "q139_loo_target_encoding",
    """
    WITH agg AS (
      SELECT p_brand, count(*) AS n_b, sum(p_retailprice) AS sum_b
      FROM part GROUP BY p_brand
    )
    SELECT p.p_partkey,
           p.p_brand,
           round(p.p_retailprice, 2) AS retailprice,
           CASE WHEN a.n_b > 1
                THEN round((a.sum_b - p.p_retailprice) / (a.n_b - 1), 6)
                ELSE NULL END        AS brand_loo_mean
    FROM part p JOIN agg a ON p.p_brand = a.p_brand
    """,
)
def q139_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding — the feature-engineering primitive
    for categorical columns in training pipelines: each row's encoded
    value is its group's mean WITH ITSELF EXCLUDED ((sum - own)/(n-1)),
    which plain groupBy means leak and per-row subqueries recompute
    O(n^2).  Scale shape: one aggregate pass per group (tiny frame,
    broadcast back onto the fact rows), encoding computed row-wise from
    the shared (sum, n) — no window, no self-join; singleton groups
    yield NULL rather than a divide-by-zero.  retailprice is 2dp data
    so the sums are decimal-exact at this scale."""
    p = _t(spark, sf_dir, "part")
    agg = p.groupBy(F.col("p_brand").alias("b")).agg(
        F.count(F.lit(1)).alias("n_b"), F.sum("p_retailprice").alias("sum_b")
    )
    return (
        p.join(F.broadcast(agg), p.p_brand == F.col("b"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("retailprice"),
            F.when(
                F.col("n_b") > 1,
                F.round(
                    (F.col("sum_b") - F.col("p_retailprice")) / (F.col("n_b") - 1), 6
                ),
            ).alias("brand_loo_mean"),
        )
    )


@_register(
    "q140_supplier_cosine",
    """
    WITH sc AS (
      SELECT l.l_suppkey AS s, o.o_custkey AS c, count(*) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    norms AS (SELECT s, sum(w * w) AS nrm2 FROM sc GROUP BY s),
    dots AS (
      SELECT a.s AS s1, b.s AS s2, sum(a.w * b.w) AS dot
      FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2
    )
    SELECT s1, s2,
           CAST(dot AS BIGINT) AS dot,
           round(dot / (sqrt(n1.nrm2) * sqrt(n2.nrm2)), 6) AS cosine
    FROM dots JOIN norms n1 ON n1.s = dots.s1 JOIN norms n2 ON n2.s = dots.s2
    ORDER BY round(dot / (sqrt(n1.nrm2) * sqrt(n2.nrm2)), 6) DESC, s1, s2
    LIMIT 20
    """,
)
def q140_supplier_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: cosine between
    suppliers over their (customer, co-order-count) basket vectors —
    the bipartite-projection primitive behind 'suppliers like this one'
    recommendations.  Scale shape: the sparse vectors stay EXPLODED
    (supplier, customer, weight) — the dot products come from one
    equi-join on the shared customer (never a dense vector
    materialization), norms are a parallel aggregate broadcast onto the
    small pair frame, and the dot/norm inputs are exact integers.  The
    top-k orders by the ROUNDED cosine (decimal-stable boundary) with
    full id tiebreaks.  Measured-negative alternative (r5): generating
    the pairs map-side via collect_list + nested-transform HOFs
    (q127's shape) ran 5.0 s vs 4.5 s for this join at sf0.1 — the
    array build costs more than the shuffle it saves; the exploded
    equi-join stays.

    Measured-negative alternative (r8): localCheckpoint'ing the
    (s, c, w) rollup so its three consumers share one fact join ran
    29.6 s vs 28.7 s at sf1 — ReuseExchange already shares the
    self-join's exchange, and materializing the multi-million-row
    rollup to executor storage costs more than norms' extra pass
    saves.  sf1 adjudication (SCALING.md): runtime is
    Θ(Σ_c deg(c)²) pair generation — ~100M pair rows into the
    (s1, s2) aggregate — the exact all-pairs cosine's intermediate
    lower bound, not a plan defect; the plan is the canonical
    exploded-sparse form (MLlib columnSimilarities without its
    sampling).  At 100 TB the contract is DIMSUM-style sampling or a
    min-coorder-count filter, both of which change the result."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    norms = sc.groupBy("s").agg(F.sum(F.col("w") * F.col("w")).alias("nrm2"))
    a, b = sc.alias("a"), sc.alias("b")
    dots = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    n1 = norms.select(F.col("s").alias("s1"), F.col("nrm2").alias("nrm1"))
    n2 = norms.select(F.col("s").alias("s2"), F.col("nrm2").alias("nrm2b"))
    cos = F.round(
        F.col("dot") / (F.sqrt(F.col("nrm1")) * F.sqrt(F.col("nrm2b"))), 6
    )
    return (
        dots.join(F.broadcast(n1), "s1")
        .join(F.broadcast(n2), "s2")
        .select(
            "s1",
            "s2",
            F.col("dot").cast("bigint").alias("dot"),
            cos.alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "s1", "s2")
        .limit(20)
    )


@_register(
    "q141_bfs_hops",
    """
    WITH RECURSIVE op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pp AS (
      SELECT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a
      JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS (SELECT pa, pb FROM pp GROUP BY pa, pb HAVING count(*) >= 2),
    bi AS (SELECT pa AS s, pb AS d FROM e UNION ALL SELECT pb, pa FROM e),
    deg AS (SELECT s AS node, count(*) AS dg FROM bi GROUP BY s),
    seed AS (SELECT node FROM deg ORDER BY dg DESC, node LIMIT 1),
    walk(node, dist) AS (
      SELECT node, 0 FROM seed
      UNION ALL
      SELECT bi.d, walk.dist + 1 FROM walk JOIN bi ON bi.s = walk.node
      WHERE walk.dist < 3
    ),
    best AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
    SELECT CAST(dist AS BIGINT)     AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM best GROUP BY dist
    """,
)
def q141_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop histogram — the fourth graph kernel (after
    connected components q70, PageRank q106, triangles q134): minimum
    hop distance from the highest-degree part to every part reachable
    within 3 hops on the support>=2 co-purchase graph ('degrees of
    separation' from the hub product).  Scale shape: frontier-expansion
    BFS — each of the 3 rounds is ONE equi-join of the current frontier
    against the bidirected edge list plus an anti-join against the
    visited set, exactly the iterative template the other kernels use;
    min-distance falls out of level-order expansion, no per-node state.
    The seed is deterministic (degree desc, id asc); edges come from
    the shared co-purchase artifact (graph.copurchase_edges_cached)."""
    from stock_ops_spark.operators.graph import copurchase_edges_cached

    e = copurchase_edges_cached(
        _t(spark, sf_dir, "lineitem"),
        source_path=catalog.table_path(sf_dir, "lineitem"),
        support=2,
    ).select("pa", "pb")
    bi = (
        e.select(F.col("pa").alias("s"), F.col("pb").alias("d"))
        .union(e.select(F.col("pb").alias("s"), F.col("pa").alias("d")))
        .localCheckpoint(eager=True)  # reused every BFS round
    )
    seed = (
        bi.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("dg"))
        .orderBy(F.col("dg").desc(), F.col("node"))
        .limit(1)
        .select("node")
    )
    visited = seed.withColumn("dist", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited.select("node")
    for hop in range(1, 4):
        neighbors = (
            frontier.join(bi, frontier.node == bi.s)
            .select(F.col("d").alias("node"))
            .distinct()
        )
        fresh = neighbors.join(visited.select("node"), "node", "left_anti").withColumn(
            "dist", F.lit(hop)
        )
        visited = visited.union(fresh).localCheckpoint(eager=True)
        frontier = fresh.select("node")
    return visited.groupBy(F.col("dist").cast("bigint").alias("dist")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


@_register(
    "q142_psi_drift",
    """
    WITH bands AS (
      SELECT unnest(range(0, 6)) AS band
    ),
    binned AS (
      SELECT least(CAST(floor(value / 100) AS BIGINT), 5) AS band,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END
                 AS period
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT b.band,
             coalesce(sum(CASE WHEN x.period = 0 THEN 1 ELSE 0 END), 0) AS n_ref,
             coalesce(sum(CASE WHEN x.period = 1 THEN 1 ELSE 0 END), 0) AS n_cur
      FROM bands b LEFT JOIN binned x ON b.band = x.band
      GROUP BY b.band
    ),
    tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts),
    probs AS (
      SELECT band, n_ref, n_cur,
             (n_ref + 1)::DOUBLE / (t_ref + 6) AS p,
             (n_cur + 1)::DOUBLE / (t_cur + 6) AS q
      FROM counts CROSS JOIN tot
    )
    SELECT CAST(band AS BIGINT)   AS band,
           CAST(n_ref AS BIGINT)  AS n_ref,
           CAST(n_cur AS BIGINT)  AS n_cur,
           round(p, 6)            AS p_ref,
           round(q, 6)            AS p_cur,
           round((p - q) * ln(p / q), 6) AS psi_contrib
    FROM probs
    UNION ALL
    SELECT -1, CAST(sum(n_ref) AS BIGINT), CAST(sum(n_cur) AS BIGINT),
           round(1.0, 6), round(1.0, 6),
           round(sum((p - q) * ln(p / q)), 6)
    FROM probs
    """,
)
def q142_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the standard production
    drift-monitoring metric between a reference and a current period:
    value-band histograms for the two halves of the event stream,
    add-one (Laplace) smoothing so empty bands stay defined, per-band
    contributions (p-q)·ln(p/q) and the summed PSI as a total row
    (band = -1; PSI > 0.2 conventionally triggers retraining).  Scale
    shape: one aggregation pass computes both period histograms
    (conditional counts), the fixed 6-band spine is a broadcast, and
    p/q are exact-integer ratios so the contributions are IEEE-identical
    across engines (the final sum is 6 terms — decimal-stable at
    round 6)."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    binned = ev.select(
        F.least(F.floor(F.col("value") / 100).cast("bigint"), F.lit(5)).alias("band"),
        F.when(F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
    )
    bands = spark.range(0, 6, 1, 1).select(F.col("id").alias("band"))
    counts = (
        F.broadcast(bands)
        .join(binned, "band", "left")
        .groupBy("band")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("period") == 0, 1).otherwise(0)), F.lit(0)
            ).alias("n_ref"),
            F.coalesce(
                F.sum(F.when(F.col("period") == 1, 1).otherwise(0)), F.lit(0)
            ).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + 1) / (F.col("t_ref") + 6)).alias("p"),
        ((F.col("n_cur") + 1) / (F.col("t_cur") + 6)).alias("q"),
    )
    per_band = probs.select(
        F.col("band").cast("bigint").alias("band"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("p_cur"),
        F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6).alias(
            "psi_contrib"
        ),
    )
    total = probs.agg(
        F.lit(-1).cast("bigint").alias("band"),
        F.sum("n_ref").cast("bigint").alias("n_ref"),
        F.sum("n_cur").cast("bigint").alias("n_cur"),
        F.round(F.lit(1.0), 6).alias("p_ref"),
        F.round(F.lit(1.0), 6).alias("p_cur"),
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi_contrib"),
    )
    return per_band.union(total)


@_register(
    "q143_dau_wau_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
    wau AS (
      SELECT days.d, count(DISTINCT ud.user_id) AS wau
      FROM days JOIN ud
        ON ud.d BETWEEN days.d - 6 AND days.d
      GROUP BY days.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d')        AS day,
           CAST(dau.dau AS BIGINT)            AS dau,
           CAST(wau.wau AS BIGINT)            AS wau,
           round(dau.dau::DOUBLE / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q143_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness (DAU/WAU): per day, the distinct active
    users that day over the distinct active users in the trailing
    7 days — the standard product-health ratio.  Sliding DISTINCT
    counts don't decompose into window aggregates (users repeat across
    days), so the exact form joins the deduped (user, day) activity
    set onto a day spine with a 7-day band — a bounded 7x fan-out of
    the ALREADY-DEDUPED activity pairs, never of the raw event stream;
    DAU rides the same deduped frame, and the ratio is two exact
    integers.  At 100 TB the same shape runs per partition-pruned day
    range, or swaps the distinct for an HLL sketch union (q43's path)
    when approximation is acceptable."""
    ud = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)  # deduped activity: reused 3x
    )
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    spine = days.select(F.col("d").alias("day_end"))
    wau = (
        F.broadcast(spine)
        .join(
            ud,
            (F.col("d") >= F.date_sub(F.col("day_end"), 6))
            & (F.col("d") <= F.col("day_end")),
        )
        .groupBy("day_end")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.day_end)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@_register(
    "q144_cohort_retention",
    """
    WITH fo AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cm
      FROM orders GROUP BY o_custkey
    ),
    act AS (
      SELECT DISTINCT o.o_custkey, fo.cm,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(fo.cm) * 12 + month(fo.cm)) AS msince
      FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey
    ),
    cs AS (SELECT cm, count(*) AS cohort_n FROM fo GROUP BY cm)
    SELECT strftime(act.cm, '%Y-%m')      AS cohort_month,
           CAST(act.msince AS BIGINT)     AS months_since,
           CAST(count(*) AS BIGINT)       AS n_active,
           CAST(cs.cohort_n AS BIGINT)    AS cohort_size,
           round(count(*)::DOUBLE / cs.cohort_n, 6) AS retention
    FROM act JOIN cs ON act.cm = cs.cm
    GROUP BY act.cm, act.msince, cs.cohort_n
    """,
)
def q144_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard growth-analytics triangle:
    customers grouped by first-order month, tracked by how many are
    still ordering N months later, as a fraction of the cohort.  Scale
    shape: the first-order frame and the activity join share ONE
    shuffle key (o_custkey — co-partitioned agg + join), the per-month
    dedup collapses before the final tiny (cohort, months_since) agg,
    and cohort sizes are a month-cardinality frame joined broadcast.
    Retention is a ratio of two exact integers (decimal-stable at
    round 6)."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    fo = o.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cm")
    )
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    act = (
        o.join(fo, "o_custkey")
        .select(
            "o_custkey",
            "cm",
            (mnum(F.col("o_orderdate")) - mnum(F.col("cm"))).alias("msince"),
        )
        .distinct()
    )
    cs = fo.groupBy("cm").agg(F.count(F.lit(1)).alias("cohort_n"))
    return (
        act.groupBy("cm", "msince")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(cs), "cm")
        .select(
            F.date_format("cm", "yyyy-MM").alias("cohort_month"),
            F.col("msince").cast("bigint").alias("months_since"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_n").cast("bigint").alias("cohort_size"),
            F.round(F.col("n_active") / F.col("cohort_n"), 6).alias("retention"),
        )
    )


@_register(
    "q145_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_o,
             count(*) AS freq,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon_c
      FROM orders GROUP BY o_custkey
    ),
    anch AS (SELECT max(last_o) AS a FROM rfm),
    base AS (
      SELECT o_custkey,
             date_diff('day', last_o, a) AS rec_d,
             freq, mon_c
      FROM rfm CROSS JOIN anch
    ),
    thr AS (
      SELECT quantile_cont(rec_d, 0.25) AS r25, quantile_cont(rec_d, 0.5) AS r50,
             quantile_cont(rec_d, 0.75) AS r75,
             quantile_cont(freq, 0.25) AS f25, quantile_cont(freq, 0.5) AS f50,
             quantile_cont(freq, 0.75) AS f75,
             quantile_cont(mon_c, 0.25) AS m25, quantile_cont(mon_c, 0.5) AS m50,
             quantile_cont(mon_c, 0.75) AS m75
      FROM base
    ),
    scored AS (
      SELECT o_custkey, rec_d, freq, mon_c,
             4 - ((rec_d > r25)::INT + (rec_d > r50)::INT + (rec_d > r75)::INT)
                 AS r_score,
             1 + (freq > f25)::INT + (freq > f50)::INT + (freq > f75)::INT
                 AS f_score,
             1 + (mon_c > m25)::INT + (mon_c > m50)::INT + (mon_c > m75)::INT
                 AS m_score
      FROM base CROSS JOIN thr
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(mon_c)::DOUBLE / count(*) / 100, 6) AS avg_monetary,
           round(sum(freq)::DOUBLE / count(*), 6)        AS avg_frequency
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def q145_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary), the
    classic CRM scoring grid.  Quartile scores are assigned by
    comparing each customer against GLOBAL exact-quantile thresholds
    (one 9-value scalar frame, broadcast) rather than ntile() — ntile
    needs a full global sort, thresholds need one aggregate; at 100 TB
    that is the difference between a single-partition sort and a
    map-side projection.  Monetary sums in exact integer cents; the
    threshold comparisons (int vs interpolated double) and the final
    averages (ratios of exact ints) are bit-identical across engines."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_o"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "mon_c"
        ),
    )
    anch = rfm.agg(F.max("last_o").alias("a"))
    base = rfm.crossJoin(F.broadcast(anch)).select(
        "o_custkey",
        F.datediff(F.col("a"), F.col("last_o")).alias("rec_d"),
        "freq",
        "mon_c",
    )
    thr = base.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c[0]}{int(q * 100)}")
            for c in ("rec_d", "freq", "mon_c")
            for q in (0.25, 0.5, 0.75)
        ]
    )
    gt = lambda c, t: (F.col(c) > F.col(t)).cast("int")  # noqa: E731
    scored = base.crossJoin(F.broadcast(thr)).select(
        (4 - (gt("rec_d", "r25") + gt("rec_d", "r50") + gt("rec_d", "r75"))).alias(
            "r_score"
        ),
        (1 + gt("freq", "f25") + gt("freq", "f50") + gt("freq", "f75")).alias(
            "f_score"
        ),
        (1 + gt("mon_c", "m25") + gt("mon_c", "m50") + gt("mon_c", "m75")).alias(
            "m_score"
        ),
        "freq",
        "mon_c",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("mon_c") / F.count(F.lit(1)) / 100, 6).alias("avg_monetary"),
        F.round(F.sum("freq") / F.count(F.lit(1)), 6).alias("avg_frequency"),
    ).select(
        F.col("r_score").cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint").alias("f_score"),
        F.col("m_score").cast("bigint").alias("m_score"),
        "n_customers",
        "avg_monetary",
        "avg_frequency",
    )


@_register(
    "q146_peak_concurrency",
    """
    WITH deltas AS (
      SELECT ts, 1 AS d FROM events
      UNION ALL
      SELECT ts + INTERVAL 15 MINUTE, -1 FROM events
    ),
    net AS (SELECT ts, sum(d) AS nd FROM deltas GROUP BY ts),
    cum AS (SELECT ts, sum(nd) OVER (ORDER BY ts) AS conc FROM net)
    SELECT epoch_us(ts) AS ts_us, CAST(conc AS BIGINT) AS concurrent
    FROM cum ORDER BY conc DESC, ts_us LIMIT 10
    """,
)
def q146_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via interval sweep-line: each event opens a
    15-minute presence interval; +1/-1 boundary deltas, a global
    running sum, and the top-10 moments by concurrent count — the
    load-planning primitive (max concurrent sessions / open orders /
    active connections).  The global prefix sum is computed SCALABLY as
    two passes: per-day partial cumulative sums (window partitioned by
    day — parallel), then day-level offsets from a tiny per-day total
    frame (window over ~30 rows) broadcast back.  No single-partition
    window ever sees the full stream, which is what makes the same
    plan hold on a year of 100 TB events.  All values exact integers;
    timestamps exported as epoch microseconds."""
    from stock_ops_spark.operators.timeseries import prefix_sum_chunked

    ev = _t(spark, sf_dir, "events").select("ts")
    deltas = ev.select("ts", F.lit(1).alias("d")).union(
        ev.select(
            (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("ts"),
            F.lit(-1).alias("d"),
        )
    )
    net = deltas.groupBy("ts").agg(F.sum("d").alias("nd"))
    cum = prefix_sum_chunked(net, "ts", "nd", F.to_date("ts"))
    return (
        cum.select(
            F.unix_micros("ts").alias("ts_us"),
            F.col("__cum").cast("bigint").alias("concurrent"),
        )
        .orderBy(F.col("concurrent").desc(), "ts_us")
        .limit(10)
    )


@_register(
    "q147_rolling_zscore",
    """
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    w AS (
      SELECT event_id, user_id, c,
             sum(c)     OVER win AS s1,
             sum(c * c) OVER win AS s2,
             count(*)   OVER win AS n
      FROM e
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
      SELECT event_id, user_id, c, n,
             (c - s1::DOUBLE / n)
             / sqrt((n * s2 - s1 * s1)::DOUBLE / (n * (n - 1))) AS z
      FROM w WHERE n >= 5 AND n * s2 - s1 * s1 > 0
    )
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT)  AS user_id,
           round(c / 100.0, 2)      AS value,
           CAST(n AS BIGINT)        AS n_window,
           round(z, 6)              AS zscore
    FROM z ORDER BY abs(z) DESC, event_id LIMIT 20
    """,
)
def q147_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    mean/stddev of its user's previous 10 events (trailing window,
    excluding self — no leakage), top-20 outliers.  The variance comes
    from EXACT integer-cent sums via the one-pass identity
    (n*s2 - s1^2) / (n*(n-1)), so mean, variance and z are identical
    IEEE doubles on both engines — a rolling stddev over raw doubles
    would be order-sensitive and unhashable.  Scale shape: one shuffle
    (partition by user), bounded 10-row frames, top-k via
    TakeOrderedAndProject; the streaming twin of this window lives in
    streaming/stateful.py (EWMA/profile processors)."""
    e = _t(spark, sf_dir, "events").where(F.col("value").isNotNull()).select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    win = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, -1)
    )
    w = e.select(
        "event_id",
        "user_id",
        "c",
        F.sum("c").over(win).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(win).alias("s2"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    z_expr = (F.col("c") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        / (F.col("n") * (F.col("n") - 1))
    )
    z = w.where(
        (F.col("n") >= 5)
        & (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1") > 0)
    ).withColumn("z", z_expr)
    return (
        z.orderBy(F.abs(F.col("z")).desc(), "event_id")
        .limit(20)
        .select(
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            F.round(F.col("c") / 100.0, 2).alias("value"),
            F.col("n").cast("bigint").alias("n_window"),
            F.round(F.col("z"), 6).alias("zscore"),
        )
    )


@_register(
    "q148_keyword_search",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    post AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN ('vector', 'stream', 'window')
      GROUP BY doc_id, t
    ),
    hits AS (
      SELECT doc_id, sum(tf) AS total_tf
      FROM post GROUP BY doc_id HAVING count(*) = 3
    )
    SELECT CAST(h.doc_id AS BIGINT)   AS doc_id,
           d.lang                     AS lang,
           CAST(h.total_tf AS BIGINT) AS total_tf,
           CAST(d.n_chars AS BIGINT)  AS n_chars
    FROM hits h JOIN documents d ON h.doc_id = d.doc_id
    ORDER BY h.total_tf DESC, h.doc_id LIMIT 20
    """,
)
def q148_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-term AND keyword search via posting-list intersection — the
    inverted-index probe (docs containing ALL of {vector, stream,
    window}, ranked by combined term frequency).  Scale shape: the term
    filter applies INSIDE the tokenize-explode pipeline (map-side — the
    posting lists for three terms are the only rows that ever shuffle,
    never the full token stream), the AND is a count-distinct-terms
    HAVING on the grouped postings (no N-way self-join), and the
    doc-metadata join happens after the top-k-sized hit set is known.
    At 100 TB the posting build is the one-time inverted-index
    artifact; the probe is unchanged."""
    terms = ["vector", "stream", "window"]
    d = _t(spark, sf_dir, "documents")
    post = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .where(F.col("t").isin(terms))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hits = (
        post.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("total_tf"))
        .where(F.col("n_terms") == len(terms))
    )
    return (
        hits.join(d.select("doc_id", "lang", "n_chars"), "doc_id")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "lang",
            F.col("total_tf").cast("bigint").alias("total_tf"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy(F.col("total_tf").desc(), "doc_id")
        .limit(20)
    )


@_register(
    "q149_twap",
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    iv AS (
      SELECT user_id, c,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
             - epoch_us(ts) AS w_us
      FROM e
    )
    SELECT CAST(user_id AS BIGINT)  AS user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(sum(w_us)::DOUBLE / 1000000, 6)          AS span_s,
           round(sum(c * w_us)::DOUBLE / sum(w_us) / 100, 6) AS twap
    FROM iv WHERE w_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q149_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    holds until the next one, so its weight is the interval length —
    the standard correction when observation arrival is bursty (a mean
    over raw rows over-weights busy periods).  Integer cents x integer
    microseconds keep the weighted sum exact (and int64-safe: cents
    < 5e4, a month of micros < 3e12, users' products sum < 1e17; at
    larger spans the sum moves to DECIMAL(38,0)).  Scale shape: one
    shuffle (partition by user) for the lead() interval build, then a
    partial-aggregable groupBy on the same key — co-partitioned, no
    second exchange."""
    e = _t(spark, sf_dir, "events").where(F.col("value").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = e.select(
        "user_id",
        "c",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("w_us"),
    ).where(F.col("w_us").isNotNull())
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.round(F.sum("w_us") / 1000000, 6).alias("span_s"),
        F.round(F.sum(F.col("c") * F.col("w_us")) / F.sum("w_us") / 100, 6).alias(
            "twap"
        ),
    ).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "n_intervals",
        "span_s",
        "twap",
    )


@_register(
    "q150_stratified_sample",
    """
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             (doc_id * 2654435761) % 10000 AS h,
             row_number() OVER (PARTITION BY lang
                                ORDER BY (doc_id * 2654435761) % 10000, doc_id)
                 AS rn,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT)  AS doc_id,
           lang                    AS lang,
           CAST(h AS BIGINT)       AS h,
           CAST(n_lang AS BIGINT)  AS n_lang,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rn <= (n_lang + 9) // 10
    """,
)
def q150_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional stratified sampling: precisely ceil(10%) of
    every language stratum, selected by rank of a deterministic
    multiplicative hash of the stable doc id — reproducible across
    runs, engines and partitionings (never rand()), and every stratum
    hits its quota EXACTLY (Bernoulli hash-threshold sampling only
    matches 10% in expectation).  The quota arithmetic is pure integer
    ((n+9) div 10 — no float ceil).  Scale shape: the rank window
    partitions BY STRATUM, so strata sort in parallel and no global
    sort exists; at 100 TB with a billion-row stratum the same plan
    swaps rank-select for threshold-select on the hash (one agg for
    the per-stratum k-th hash value)."""
    d = _t(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(10000))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = d.select(
        "doc_id",
        "lang",
        "n_chars",
        h.alias("h"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_lang"),
    )
    return ranked.where(
        F.col("rn") <= F.expr("(n_lang + 9) div 10")
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.col("h").cast("bigint").alias("h"),
        F.col("n_lang").cast("bigint").alias("n_lang"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


@_register(
    "q151_revenue_pareto",
    """
    WITH cust AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    thr AS (
      SELECT quantile_cont(rev_c, 0.1) AS t1, quantile_cont(rev_c, 0.2) AS t2,
             quantile_cont(rev_c, 0.3) AS t3, quantile_cont(rev_c, 0.4) AS t4,
             quantile_cont(rev_c, 0.5) AS t5, quantile_cont(rev_c, 0.6) AS t6,
             quantile_cont(rev_c, 0.7) AS t7, quantile_cont(rev_c, 0.8) AS t8,
             quantile_cont(rev_c, 0.9) AS t9
      FROM cust
    ),
    dec AS (
      SELECT o_custkey, rev_c,
             1 + (rev_c > t1)::INT + (rev_c > t2)::INT + (rev_c > t3)::INT
               + (rev_c > t4)::INT + (rev_c > t5)::INT + (rev_c > t6)::INT
               + (rev_c > t7)::INT + (rev_c > t8)::INT + (rev_c > t9)::INT
                 AS decile
      FROM cust CROSS JOIN thr
    ),
    agg AS (
      SELECT decile, count(*) AS n_cust, sum(rev_c) AS rev_c
      FROM dec GROUP BY decile
    ),
    tot AS (SELECT sum(rev_c) AS t FROM agg)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_cust AS BIGINT) AS n_customers,
           round(agg.rev_c::DOUBLE / 100, 2) AS revenue,
           round(agg.rev_c::DOUBLE / tot.t, 6) AS share,
           round(sum(agg.rev_c) OVER (ORDER BY decile DESC)::DOUBLE / tot.t, 6)
               AS cum_share_from_top
    FROM agg CROSS JOIN tot
    """,
)
def q151_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto / Lorenz) report: customers bucketed
    into revenue deciles by GLOBAL exact-quantile thresholds, each
    decile's revenue share and the cumulative share from the top —
    'do 20% of customers produce 80% of revenue'.  Same
    threshold-broadcast discipline as q145: no ntile global sort; one
    customer-key aggregation, one 9-value scalar frame broadcast back,
    and a 10-row decile frame where the cumulative window is free.
    Revenue in exact integer cents end-to-end; every emitted float is
    a ratio of exact integers."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("rev_c")
    )
    qs = [i / 10 for i in range(1, 10)]
    thr = cust.agg(
        *[F.expr(f"percentile(rev_c, {q})").alias(f"t{i}") for i, q in enumerate(qs, 1)]
    )
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + (F.col("rev_c") > F.col(f"t{i}")).cast("int")
    agg = (
        cust.crossJoin(F.broadcast(thr))
        .select("rev_c", decile.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("rev_c").alias("rev_c"))
    )
    tot = agg.agg(F.sum("rev_c").alias("t"))
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_cust").cast("bigint").alias("n_customers"),
            F.round(F.col("rev_c") / 100, 2).alias("revenue"),
            F.round(F.col("rev_c") / F.col("t"), 6).alias("share"),
            F.round(F.sum("rev_c").over(w) / F.col("t"), 6).alias(
                "cum_share_from_top"
            ),
        )
    )


@_register(
    "q152_profile_orders",
    """
    WITH m AS (
      SELECT
        count(*) AS n,
        count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
          CAST(min(o_orderkey) AS VARCHAR) AS mn1,
          CAST(max(o_orderkey) AS VARCHAR) AS mx1,
        count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
          CAST(min(o_custkey) AS VARCHAR) AS mn2,
          CAST(max(o_custkey) AS VARCHAR) AS mx2,
        count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS nd3,
          min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
        count(o_totalprice) AS nn4, count(DISTINCT o_totalprice) AS nd4,
          CAST(CAST(round(min(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mn4,
          CAST(CAST(round(max(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mx4,
        count(o_orderdate) AS nn5, count(DISTINCT o_orderdate) AS nd5,
          strftime(min(o_orderdate), '%Y-%m-%d') AS mn5,
          strftime(max(o_orderdate), '%Y-%m-%d') AS mx5,
        count(o_orderpriority) AS nn6, count(DISTINCT o_orderpriority) AS nd6,
          min(o_orderpriority) AS mn6, max(o_orderpriority) AS mx6
      FROM orders
    )
    SELECT 'o_orderkey' AS col, CAST(n - nn1 AS BIGINT) AS n_nulls,
           CAST(nd1 AS BIGINT) AS n_distinct, mn1 AS min_s, mx1 AS max_s FROM m
    UNION ALL
    SELECT 'o_custkey', CAST(n - nn2 AS BIGINT), CAST(nd2 AS BIGINT), mn2, mx2 FROM m
    UNION ALL
    SELECT 'o_orderstatus', CAST(n - nn3 AS BIGINT), CAST(nd3 AS BIGINT), mn3, mx3 FROM m
    UNION ALL
    SELECT 'o_totalprice', CAST(n - nn4 AS BIGINT), CAST(nd4 AS BIGINT), mn4, mx4 FROM m
    UNION ALL
    SELECT 'o_orderdate', CAST(n - nn5 AS BIGINT), CAST(nd5 AS BIGINT), mn5, mx5 FROM m
    UNION ALL
    SELECT 'o_orderpriority', CAST(n - nn6 AS BIGINT), CAST(nd6 AS BIGINT), mn6, mx6 FROM m
    """,
)
def q152_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling report (the df.summary()/ANALYZE TABLE surface):
    per-column null count, exact distinct count, and min/max for every
    orders column, normalized to strings (money as exact integer cents,
    dates ISO-formatted) so one schema carries all types.  Scale shape:
    ONE scan computes every measure in a single multi-distinct
    aggregate (Catalyst expands to one Expand + agg — not six passes);
    the unpivot to rows happens on the 1-row result frame, which is
    free.  At 100 TB the exact count(DISTINCT) swaps for
    approx_count_distinct per the q43 note; everything else is
    partial-aggregable."""
    o = _t(spark, sf_dir, "orders")
    cents = lambda c: F.round(c * 100, 0).cast("bigint")  # noqa: E731
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn1"),
        F.countDistinct("o_orderkey").alias("nd1"),
        F.min("o_orderkey").cast("string").alias("mn1"),
        F.max("o_orderkey").cast("string").alias("mx1"),
        F.count("o_custkey").alias("nn2"),
        F.countDistinct("o_custkey").alias("nd2"),
        F.min("o_custkey").cast("string").alias("mn2"),
        F.max("o_custkey").cast("string").alias("mx2"),
        F.count("o_orderstatus").alias("nn3"),
        F.countDistinct("o_orderstatus").alias("nd3"),
        F.min("o_orderstatus").alias("mn3"),
        F.max("o_orderstatus").alias("mx3"),
        F.count("o_totalprice").alias("nn4"),
        F.countDistinct("o_totalprice").alias("nd4"),
        cents(F.min("o_totalprice")).cast("string").alias("mn4"),
        cents(F.max("o_totalprice")).cast("string").alias("mx4"),
        F.count("o_orderdate").alias("nn5"),
        F.countDistinct("o_orderdate").alias("nd5"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("mn5"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("mx5"),
        F.count("o_orderpriority").alias("nn6"),
        F.countDistinct("o_orderpriority").alias("nd6"),
        F.min("o_orderpriority").alias("mn6"),
        F.max("o_orderpriority").alias("mx6"),
    )
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    # unpivot on the 1-ROW result frame (explode of a literal struct
    # array) — a union of six selects would recompute the aggregate six
    # times, i.e. six scans; this is one scan + a free row expansion
    structs = [
        F.struct(
            F.lit(col).alias("col"),
            (F.col("n") - F.col(f"nn{i}")).cast("bigint").alias("n_nulls"),
            F.col(f"nd{i}").cast("bigint").alias("n_distinct"),
            F.col(f"mn{i}").alias("min_s"),
            F.col(f"mx{i}").alias("max_s"),
        )
        for i, col in enumerate(cols, 1)
    ]
    return m.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


@_register(
    "q153_event_velocity",
    """
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT)  AS user_id,
           event_type               AS event_type,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                               RANGE BETWEEN 3600000000 PRECEDING
                                         AND 1 PRECEDING) AS BIGINT)
               AS n_prev_hour
    FROM events
    ORDER BY n_prev_hour DESC, event_id LIMIT 20
    """,
)
def q153_event_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity counting — the fraud/rate-limit primitive: for every
    event, how many events the same user produced in the preceding
    hour, by TIME-range frame (complement of q147's row-count frame;
    a row frame can't express 'last hour' when arrival is bursty).
    The frame bound is exact integer microseconds (epoch_us ordering),
    so frame membership is bit-identical across engines.  Scale shape:
    one shuffle (partition by user), per-user time-sorted range frames,
    top-k via TakeOrderedAndProject; the streaming twin is a
    watermarked sliding-window count."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600_000_000, -1)
    )
    return (
        e.select(
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            "event_type",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_prev_hour"),
        )
        .orderBy(F.col("n_prev_hour").desc(), "event_id")
        .limit(20)
    )


@_register(
    "q154_order_backlog",
    """
    WITH closes AS (
      SELECT o.o_orderkey, o.o_orderdate, max(l.l_shipdate) AS close_d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    spine AS (
      SELECT last_day(CAST(unnest(range(TIMESTAMP '1995-01-01',
                                        TIMESTAMP '2002-01-01',
                                        INTERVAL 1 MONTH)) AS DATE)) AS rd
    )
    SELECT strftime(s.rd, '%Y-%m-%d')  AS report_date,
           CAST(count(c.o_orderkey) AS BIGINT) AS open_orders
    FROM spine s LEFT JOIN closes c
      ON c.o_orderdate <= s.rd AND c.close_d > s.rd
    GROUP BY s.rd
    """,
)
def q154_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time backlog: open orders (ordered but not fully
    shipped) as of every month-end 1995-2001 — the as-of inventory /
    WIP report that validity-interval tables (q133 SCD2) exist to
    answer.  Scale shape: order open-intervals build with one
    co-partitioned key join + agg; the 84-row month-end spine
    broadcasts onto the interval frame, so the containment test is a
    map-side fan-out bounded by (rows x avg open months), never a
    shuffle of the fact table by date.  Left join keeps empty
    month-ends at zero.  Counts exact."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    closes = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("close_d"))
    )
    spine = (
        spark.range(0, 84, 1, 1)
        .select(
            F.last_day(
                F.add_months(F.lit("1995-01-01").cast("date"), F.col("id").cast("int"))
            ).alias("rd")
        )
    )
    return (
        F.broadcast(spine)
        .join(
            closes,
            (F.col("o_orderdate") <= F.col("rd")) & (F.col("close_d") > F.col("rd")),
            "left",
        )
        .groupBy("rd")
        .agg(F.count("o_orderkey").cast("bigint").alias("open_orders"))
        .select(
            F.date_format("rd", "yyyy-MM-dd").alias("report_date"), "open_orders"
        )
    )


@_register(
    "q155_ewma_daily_revenue",
    """
    WITH rev AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CAST(round(value * 100) AS BIGINT)) AS rc
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
      GROUP BY 1
    ),
    e AS (
      SELECT a.d, a.rc,
             sum(b.rc * power(2.0, -date_diff('day', b.d, a.d))) AS num,
             sum(power(2.0, -date_diff('day', b.d, a.d)))        AS den
      FROM rev a JOIN rev b ON b.d BETWEEN a.d - 13 AND a.d
      GROUP BY a.d, a.rc
    )
    SELECT strftime(d, '%Y-%m-%d')     AS day,
           round(rc::DOUBLE / 100, 2)  AS revenue,
           round(num / den / 100, 6)   AS ewma_revenue
    FROM e
    """,
)
def q155_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily purchase revenue
    (half-life 1 day, 14-day support) — the trend-smoothing twin of
    the streaming EWMA processor (streaming/stateful.py), computed in
    batch as a weighted band join on the daily rollup.  Determinism by
    construction: alpha = 1/2 makes every weight an exact power of
    two, and cent-integer revenues x dyadic weights sum EXACTLY in
    IEEE doubles (< 53 bits used) — so the float sums are
    order-independent and hash-stable, where an arbitrary-alpha EWMA
    would not be.  Scale shape: the heavy work is the one daily
    aggregation; the 14-wide band self-join runs on the tiny day
    frame (365 rows/year even at 100 TB)."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    )
    rev = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("rc")
    )
    a, b = rev.alias("a"), rev.alias("b")
    wgt = F.pow(F.lit(2.0), -F.datediff(F.col("a.d"), F.col("b.d")))
    e = (
        a.join(
            F.broadcast(b),
            (F.col("b.d") >= F.date_sub(F.col("a.d"), 13))
            & (F.col("b.d") <= F.col("a.d")),
        )
        .groupBy(F.col("a.d").alias("d"), F.col("a.rc").alias("rc"))
        .agg(
            F.sum(F.col("b.rc") * wgt).alias("num"),
            F.sum(wgt).alias("den"),
        )
    )
    return e.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(F.col("rc") / 100, 2).alias("revenue"),
        F.round(F.col("num") / F.col("den") / 100, 6).alias("ewma_revenue"),
    )


@_register(
    "q156_conversion_lag",
    """
    WITH su AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
      GROUP BY e.user_id
    ),
    lag_d AS (
      SELECT su.user_id,
             CASE WHEN pu.p_ts IS NULL THEN NULL
                  ELSE date_diff('day', su.s_ts, pu.p_ts) END AS days
      FROM su LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    tot AS (SELECT count(*) AS n_signup FROM lag_d)
    SELECT CAST(coalesce(days, -1) AS BIGINT) AS days_to_convert,
           CAST(count(*) AS BIGINT)           AS n_users,
           round(count(*)::DOUBLE / tot.n_signup, 6) AS frac_of_signups
    FROM lag_d CROSS JOIN tot
    GROUP BY coalesce(days, -1), tot.n_signup
    """,
)
def q156_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-purchase conversion-lag distribution (survival-curve
    input): per signed-up user the whole-day delay to their first
    purchase AT OR AFTER signup, histogrammed; never-converted users
    land in the -1 bucket so the funnel denominator is visible in the
    same frame.  Scale shape: both event subsets collapse to
    one-row-per-user aggregates on the SAME shuffle key before the
    left join (co-partitioned, no fact-level join), and the histogram
    is a tiny second agg.  Fractions are ratios of exact integers."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lag_d = su.join(pu, "user_id", "left").select(
        F.coalesce(F.datediff("p_ts", "s_ts"), F.lit(-1)).alias("days")
    )
    tot = lag_d.agg(F.count(F.lit(1)).alias("n_signup"))
    return (
        lag_d.groupBy("days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("days").cast("bigint").alias("days_to_convert"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(F.col("n_users") / F.col("n_signup"), 6).alias(
                "frac_of_signups"
            ),
        )
    )


@_register(
    "q157_dow_seasonality",
    """
    WITH o AS (
      SELECT dayofweek(o_orderdate) AS dow,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    agg AS (SELECT dow, count(*) AS n, sum(c) AS rc FROM o GROUP BY dow),
    tot AS (SELECT sum(n) AS tn, sum(rc) AS trc FROM agg)
    SELECT CAST(dow AS BIGINT)                        AS dow,
           CAST(n AS BIGINT)                          AS n_orders,
           round(rc::DOUBLE / 100, 2)                 AS revenue,
           round(rc::DOUBLE / tot.trc, 6)             AS revenue_share,
           round((rc::DOUBLE / n) / (tot.trc::DOUBLE / tot.tn), 6)
               AS aov_lift
    FROM agg CROSS JOIN tot
    """,
)
def q157_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: order count, revenue, revenue share and
    average-order-value lift vs the overall mean, per weekday — the
    calendar-decomposition report (and the q37 period-enumeration
    family's analytical consumer).  DuckDB dayofweek() is 0=Sunday;
    Spark dayofweek() is 1=Sunday, so the Spark side subtracts one to
    pin identical bucket ids.  All shares/lifts are ratios of exact
    integer cents and counts."""
    o = _t(spark, sf_dir, "orders").select(
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    agg = o.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("rc")
    )
    tot = agg.agg(F.sum("n").alias("tn"), F.sum("rc").alias("trc"))
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("bigint").alias("dow"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("rc") / 100, 2).alias("revenue"),
        F.round(F.col("rc") / F.col("trc"), 6).alias("revenue_share"),
        F.round(
            (F.col("rc") / F.col("n")) / (F.col("trc") / F.col("tn")), 6
        ).alias("aov_lift"),
    )


@_register(
    "q158_error_mtbf",
    """
    WITH err AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
    ),
    gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id))
                 AS gap_us
      FROM err
    )
    SELECT CAST(user_id AS BIGINT)      AS user_id,
           CAST(count(*) AS BIGINT)     AS n_gaps,
           round(avg(gap_us::DOUBLE) / 1000000, 6) AS mtbf_s,
           round(min(gap_us)::DOUBLE / 1000000, 6) AS min_gap_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    ORDER BY mtbf_s ASC, user_id LIMIT 20
    """,
)
def q158_error_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean time between failures per user: consecutive-error gaps via
    lag() over the error subset, averaged — the reliability/SLO
    primitive (worst-20 users by MTBF = the noisiest error producers).
    Gaps are exact integer microseconds, so avg is a ratio of exact
    integers.  Scale shape: the event_type filter prunes at the scan,
    one shuffle (partition by user) serves both the lag and the
    aggregate — co-partitioned."""
    err = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    ).select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = err.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1000000, 6).alias("mtbf_s"),
            F.round(F.min("gap_us") / 1000000, 6).alias("min_gap_s"),
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "n_gaps",
            "mtbf_s",
            "min_gap_s",
        )
        .orderBy(F.col("mtbf_s").asc(), "user_id")
        .limit(20)
    )


@_register(
    "q159_priority_status_pivot",
    """
    SELECT o_orderpriority AS priority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_p,
           round(sum(CASE WHEN o_orderstatus = 'F'
                          THEN CAST(round(o_totalprice * 100) AS BIGINT)
                          ELSE 0 END)::DOUBLE / 100, 2) AS rev_f,
           round(sum(CASE WHEN o_orderstatus = 'O'
                          THEN CAST(round(o_totalprice * 100) AS BIGINT)
                          ELSE 0 END)::DOUBLE / 100, 2) AS rev_o,
           round(sum(CASE WHEN o_orderstatus = 'P'
                          THEN CAST(round(o_totalprice * 100) AS BIGINT)
                          ELSE 0 END)::DOUBLE / 100, 2) AS rev_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q159_priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot report — the df.groupBy().pivot() API surface: order
    counts and exact-cent revenue cross-tabbed priority x status.  The
    pivot values are EXPLICITLY enumerated ('F','O','P'), which is the
    scale-correct form: an unenumerated pivot forces an extra
    distinct-values pass over the fact table before the real
    aggregation.  Catalyst compiles this to ONE pass of conditional
    aggregates — same plan as the SQL twin's CASE columns."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    piv = (
        o.groupBy("priority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("rc"),
        )
    )
    return piv.select(
        "priority",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).cast("bigint").alias("n_p"),
        F.round(F.coalesce(F.col("F_rc"), F.lit(0)) / 100, 2).alias("rev_f"),
        F.round(F.coalesce(F.col("O_rc"), F.lit(0)) / 100, 2).alias("rev_o"),
        F.round(F.coalesce(F.col("P_rc"), F.lit(0)) / 100, 2).alias("rev_p"),
    )


@_register(
    "q160_priority_transitions",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS cur,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ),
    t AS (
      SELECT prev, cur, count(*) AS n FROM seq
      WHERE prev IS NOT NULL GROUP BY prev, cur
    ),
    r AS (SELECT prev, sum(n) AS tot FROM t GROUP BY prev)
    SELECT t.prev                        AS prev_priority,
           t.cur                         AS next_priority,
           CAST(t.n AS BIGINT)           AS n_transitions,
           round(t.n::DOUBLE / r.tot, 6) AS p_transition
    FROM t JOIN r ON r.prev = t.prev
    """,
)
def q160_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each customer's order
    sequence: P(next order priority | previous order priority) — the
    sequence-modeling primitive (next-event prediction features, session
    grammars).  Scale shape: one shuffle (partition by customer) feeds
    the lag(); the transition matrix is a 5x5 aggregate and row
    normalization joins on the 5-row margins frame.  Probabilities are
    ratios of exact transition counts."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_orderpriority").alias("cur"),
        F.lag("o_orderpriority").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    t = seq.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("n"))
    r = t.groupBy("prev").agg(F.sum("n").alias("tot"))
    return t.join(F.broadcast(r), "prev").select(
        F.col("prev").alias("prev_priority"),
        F.col("cur").alias("next_priority"),
        F.col("n").cast("bigint").alias("n_transitions"),
        F.round(F.col("n") / F.col("tot"), 6).alias("p_transition"),
    )


@_register(
    "q161_wow_growth",
    """
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS w,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rc,
             count(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT strftime(w, '%Y-%m-%d')       AS week_start,
           CAST(n AS BIGINT)             AS n_orders,
           round(rc::DOUBLE / 100, 2)    AS revenue,
           round((rc - lag(rc) OVER (ORDER BY w))::DOUBLE
                 / lag(rc) OVER (ORDER BY w), 6) AS wow_growth,
           round(avg(rc) OVER (ORDER BY w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                 / 100, 6)               AS ma4_revenue
    FROM wk
    """,
)
def q161_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth + 4-week moving average — the
    reporting-cadence trend table.  The heavy work is the weekly
    rollup (one partial-aggregable shuffle); the lag/moving-average
    window then runs on the ~350-row weekly frame, where a global
    ordering is free (and at 100 TB still is — weeks/year don't grow
    with data).  Revenue exact cents; growth and MA are ratios of
    exact integers (avg over a 4-row frame of ints divides exactly
    once)."""
    o = _t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    wk = o.groupBy(F.date_trunc("week", "o_orderdate").alias("w")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("rc"),
        F.count(F.lit(1)).alias("n"),
    )
    w_ord = Window.orderBy("w")
    w_ma = Window.orderBy("w").rowsBetween(-3, 0)
    return wk.select(
        F.date_format("w", "yyyy-MM-dd").alias("week_start"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("rc") / 100, 2).alias("revenue"),
        F.round(
            (F.col("rc") - F.lag("rc").over(w_ord)) / F.lag("rc").over(w_ord), 6
        ).alias("wow_growth"),
        F.round(F.avg("rc").over(w_ma) / 100, 6).alias("ma4_revenue"),
    )


@_register(
    "q162_embedding_outliers",
    """
    WITH ex AS (
      SELECT vec_id, label, i.range AS d,
             CAST(round(CAST(embedding[i.range] AS DOUBLE) * 10000) AS BIGINT)
                 AS q
      FROM embeddings CROSS JOIN range(1, 65) i
    ),
    n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    cent AS (SELECT label, d, sum(q) AS s FROM ex GROUP BY label, d),
    dist AS (
      SELECT ex.vec_id, ex.label,
             sum((n.n * ex.q - c.s) * (n.n * ex.q - c.s)) AS dd
      FROM ex
      JOIN cent c ON c.label = ex.label AND c.d = ex.d
      JOIN n ON n.label = ex.label
      GROUP BY ex.vec_id, ex.label
    )
    SELECT CAST(dist.vec_id AS BIGINT) AS vec_id,
           CAST(dist.label AS BIGINT)  AS label,
           round(sqrt(dd) / n.n / 10000, 6) AS dist_to_centroid
    FROM dist JOIN n ON n.label = dist.label
    ORDER BY sqrt(dd) / n.n DESC, dist.vec_id LIMIT 20
    """,
)
def q162_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection: the 20 vectors farthest (L2) from
    their label centroid — the mislabeled/garbage-vector scrub that
    runs before training on embedding corpora.  Exactness by
    construction: dims quantize to integer ten-thousandths, and the
    distance comparison uses n^2*D = sum_d (n*q_d - s_d)^2 — ALL
    integer arithmetic (the centroid never materializes as a float),
    so ordering is bit-stable across engines; the only float is the
    final display value.  Scale shape: explode to (vec,dim) rows, one
    agg for per-(label,dim) sums (640 rows — broadcast back), one agg
    per vector, top-k.  No pairwise products anywhere."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "vec_id",
        "label",
        "d",
        F.round(F.col("x").cast("double") * 10000, 0).cast("bigint").alias("q"),
    )
    n = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    cent = ex.groupBy("label", "d").agg(F.sum("q").alias("s"))
    term = (F.col("n") * F.col("q") - F.col("s"))
    dist = (
        ex.join(F.broadcast(cent), ["label", "d"])
        .join(F.broadcast(n), "label")
        .groupBy("vec_id", "label")
        .agg(F.sum(term * term).alias("dd"))
    )
    return (
        dist.join(F.broadcast(n), "label")
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("label").cast("bigint").alias("label"),
            (F.sqrt("dd") / F.col("n")).alias("__o"),
        )
        .orderBy(F.col("__o").desc(), "vec_id")
        .limit(20)
        .select(
            "vec_id", "label", F.round(F.col("__o") / 10000, 6).alias("dist_to_centroid")
        )
    )


@_register(
    "q163_kcore_peel",
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
    bi0 AS (SELECT pa AS s, pb AS d FROM e UNION ALL SELECT pb, pa FROM e),
    a1 AS (SELECT s FROM bi0 GROUP BY s HAVING count(*) >= 3),
    bi1 AS (
      SELECT bi0.s, bi0.d FROM bi0
      JOIN a1 x ON x.s = bi0.s JOIN a1 y ON y.s = bi0.d
    ),
    a2 AS (SELECT s FROM bi1 GROUP BY s HAVING count(*) >= 3),
    bi2 AS (
      SELECT bi1.s, bi1.d FROM bi1
      JOIN a2 x ON x.s = bi1.s JOIN a2 y ON y.s = bi1.d
    ),
    a3 AS (SELECT s FROM bi2 GROUP BY s HAVING count(*) >= 3),
    bi3 AS (
      SELECT bi2.s, bi2.d FROM bi2
      JOIN a3 x ON x.s = bi2.s JOIN a3 y ON y.s = bi2.d
    )
    SELECT 1 AS round, CAST(count(DISTINCT s) AS BIGINT) AS n_nodes,
           CAST(count(*) / 2 AS BIGINT) AS n_edges FROM bi1
    UNION ALL
    SELECT 2, CAST(count(DISTINCT s) AS BIGINT), CAST(count(*) / 2 AS BIGINT) FROM bi2
    UNION ALL
    SELECT 3, CAST(count(DISTINCT s) AS BIGINT), CAST(count(*) / 2 AS BIGINT) FROM bi3
    """,
)
def q163_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core peeling, 3 rounds — the fifth graph kernel (after CC,
    PageRank, triangles, BFS): iteratively drop nodes with degree < 3
    from the support>=2 co-purchase graph and report surviving
    node/edge counts per round — the dense-subgraph extraction that
    feeds community mining.  Each round is one degree aggregate plus
    two semi-joins of the edge list against the survivor set — the
    same bounded-iteration template as q70/q106/q141, with
    localCheckpoint severing lineage growth.  Edges come from the
    shared co-purchase artifact."""
    from stock_ops_spark.operators.graph import copurchase_edges_cached

    e = copurchase_edges_cached(
        _t(spark, sf_dir, "lineitem"),
        source_path=catalog.table_path(sf_dir, "lineitem"),
        support=2,
    ).select("pa", "pb")
    bi = (
        e.select(F.col("pa").alias("s"), F.col("pb").alias("d"))
        .union(e.select(F.col("pb").alias("s"), F.col("pa").alias("d")))
        .localCheckpoint(eager=True)
    )
    out = []
    for rnd in range(1, 4):
        alive = bi.groupBy("s").agg(F.count(F.lit(1)).alias("dg")).where(
            F.col("dg") >= 3
        ).select("s")
        bi = (
            bi.join(alive, "s", "left_semi")
            .join(alive.select(F.col("s").alias("d")), "d", "left_semi")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
        out.append(
            bi.agg(
                F.lit(rnd).alias("round"),
                F.countDistinct("s").cast("bigint").alias("n_nodes"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.union(df)
    return res


@_register(
    "q164_ab_test_lift",
    """
    WITH m AS (
      SELECT CASE WHEN (user_id * 2654435761) % 2 = 0 THEN 'A' ELSE 'B' END
                 AS arm,
             count(*) AS n_events,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS n_purch,
             count(DISTINCT user_id) AS n_users,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                 AS rev_c
      FROM events GROUP BY arm
    ),
    wide AS (
      SELECT
        max(CASE WHEN arm = 'A' THEN n_events END) AS ea,
        max(CASE WHEN arm = 'A' THEN n_purch END)  AS ca,
        max(CASE WHEN arm = 'A' THEN n_users END)  AS ua,
        max(CASE WHEN arm = 'A' THEN rev_c END)    AS ra,
        max(CASE WHEN arm = 'B' THEN n_events END) AS eb,
        max(CASE WHEN arm = 'B' THEN n_purch END)  AS cb,
        max(CASE WHEN arm = 'B' THEN n_users END)  AS ub,
        max(CASE WHEN arm = 'B' THEN rev_c END)    AS rb
      FROM m
    )
    SELECT CAST(ea AS BIGINT) AS events_a, CAST(ca AS BIGINT) AS purch_a,
           CAST(eb AS BIGINT) AS events_b, CAST(cb AS BIGINT) AS purch_b,
           round(ca::DOUBLE / ea, 6) AS rate_a,
           round(cb::DOUBLE / eb, 6) AS rate_b,
           round(cb::DOUBLE / eb - ca::DOUBLE / ea, 6) AS abs_lift,
           round((cb::DOUBLE / eb - ca::DOUBLE / ea)
                 / sqrt((ca + cb)::DOUBLE / (ea + eb)
                        * (1 - (ca + cb)::DOUBLE / (ea + eb))
                        * (1.0 / ea + 1.0 / eb)), 6) AS z_stat,
           round(rb::DOUBLE / ub / 100 - ra::DOUBLE / ua / 100, 6)
               AS rev_per_user_lift
    FROM wide
    """,
)
def q164_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split deterministically into two
    arms by the stable multiplicative hash (q124's split discipline —
    reproducible, no rand()), then event-level purchase rate per arm,
    absolute lift, the two-proportion pooled z-statistic, and
    revenue-per-user lift.  Proportions are EVENT-level (purchase
    events / all events) so the pooled rate is never degenerate (a
    per-user conversion flag saturates at 1.0 on an engaged corpus and
    zeroes the z denominator).  Every z input is an exact integer, so
    the statistic is the same IEEE double on both engines.  Scale
    shape: arm assignment is a map-side projection; one aggregate over
    (arm); the final 1-row pivot is free (exact distinct-user counts
    swap for HLL at 100 TB per q43)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    arm = F.when(
        F.pmod(F.col("user_id") * F.lit(2654435761), F.lit(2)) == 0, "A"
    ).otherwise("B")
    m = (
        ev.withColumn("arm", arm)
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purch"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev_c"),
        )
    )
    wide = m.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_events"))).alias("ea"),
        F.max(F.when(F.col("arm") == "A", F.col("n_purch"))).alias("ca"),
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("ua"),
        F.max(F.when(F.col("arm") == "A", F.col("rev_c"))).alias("ra"),
        F.max(F.when(F.col("arm") == "B", F.col("n_events"))).alias("eb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_purch"))).alias("cb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("ub"),
        F.max(F.when(F.col("arm") == "B", F.col("rev_c"))).alias("rb"),
    )
    ea, ca, ua, ra = F.col("ea"), F.col("ca"), F.col("ua"), F.col("ra")
    eb, cb, ub, rb = F.col("eb"), F.col("cb"), F.col("ub"), F.col("rb")
    pool = (ca + cb) / (ea + eb)
    z = ((cb / eb) - (ca / ea)) / F.sqrt(
        pool * (1 - pool) * (1.0 / ea + 1.0 / eb)
    )
    return wide.select(
        ea.cast("bigint").alias("events_a"),
        ca.cast("bigint").alias("purch_a"),
        eb.cast("bigint").alias("events_b"),
        cb.cast("bigint").alias("purch_b"),
        F.round(ca / ea, 6).alias("rate_a"),
        F.round(cb / eb, 6).alias("rate_b"),
        F.round(cb / eb - ca / ea, 6).alias("abs_lift"),
        F.round(z, 6).alias("z_stat"),
        F.round(rb / ub / 100 - ra / ua / 100, 6).alias("rev_per_user_lift"),
    )


@_register(
    "q165_event_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT)             AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY path
    ORDER BY n_occurrences DESC, path LIMIT 15
    """,
)
def q165_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 15 most common 3-event sequences
    (trigram paths) across user timelines — the product-analytics
    'what do users do next' report and the context→next training-pair
    extractor for sequence models.  Scale shape: one shuffle
    (partition by user) feeds both lead() offsets, the trigram
    space is tiny (5^3) so the count agg is map-side combined, and
    top-k plans as TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path"), "user_id"
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(15)
    )


@_register(
    "q166_mad_outliers",
    """
    WITH c AS (
      SELECT c_custkey, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer
    ),
    med AS (SELECT quantile_cont(bal_c, 0.5) AS m FROM c),
    mad AS (
      SELECT quantile_cont(abs(bal_c - m), 0.5) AS mad, any_value(m) AS m
      FROM c CROSS JOIN med
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           c_name                    AS c_name,
           round(bal_c::DOUBLE / 100, 2) AS acctbal,
           round((bal_c - m) / (1.4826 * mad), 6) AS robust_z
    FROM c CROSS JOIN mad
    ORDER BY abs((bal_c - m) / (1.4826 * mad)) DESC, c_custkey
    LIMIT 20
    """,
)
def q166_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: account
    the top-20 balances by scaled-MAD robust z — the skew-immune
    alternative to mean/stddev z-scores (one whale pulls a mean; it
    can't pull a median).  Two exact-quantile passes
    (median, then MAD on integer cents), each a scalar broadcast —
    never a global sort; the robust z is exact-int arithmetic over
    broadcast scalars x one constant.  Top-20 by |z| with key
    tiebreak."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal_c"),
    )
    med = c.agg(F.expr("percentile(bal_c, 0.5)").alias("m"))
    mad = (
        c.crossJoin(F.broadcast(med))
        .agg(
            F.expr("percentile(abs(bal_c - m), 0.5)").alias("mad"),
            F.first("m").alias("m"),
        )
    )
    rz = (F.col("bal_c") - F.col("m")) / (1.4826 * F.col("mad"))
    return (
        c.crossJoin(F.broadcast(mad))
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            F.round(F.col("bal_c") / 100, 2).alias("acctbal"),
            rz.alias("__rz"),
        )
        .orderBy(F.abs(F.col("__rz")).desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey", "c_name", "acctbal", F.round("__rz", 6).alias("robust_z")
        )
    )


@_register(
    "q167_benford_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n) AS t FROM obs)
    SELECT CAST(obs.digit AS BIGINT) AS digit,
           CAST(obs.n AS BIGINT)     AS n_observed,
           round(obs.n::DOUBLE / tot.t, 6)            AS p_observed,
           round(log10(1 + 1.0 / obs.digit), 6)       AS p_benford,
           round((obs.n::DOUBLE / tot.t - log10(1 + 1.0 / obs.digit))
                 * (obs.n::DOUBLE / tot.t - log10(1 + 1.0 / obs.digit))
                 / log10(1 + 1.0 / obs.digit) * tot.t, 6) AS chi2_contrib
    FROM obs CROSS JOIN tot
    """,
)
def q167_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit on order totals: observed leading-digit
    distribution vs the log10(1+1/d) expectation with per-digit
    chi-square contributions — the forensic-accounting screen for
    fabricated amounts.  The leading digit comes from the CENTS
    integer's string form (a double's string form differs between
    engines; an integer's doesn't).  One aggregation over a 9-value
    key, counts exact, every float a deterministic function of exact
    integers.  Scale: map-side combinable, output fixed at 9 rows."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.agg(F.sum("n").alias("t"))
    p_obs = F.col("n") / F.col("t")
    p_ben = F.log10(1 + 1.0 / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("digit").cast("bigint").alias("digit"),
        F.col("n").cast("bigint").alias("n_observed"),
        F.round(p_obs, 6).alias("p_observed"),
        F.round(p_ben, 6).alias("p_benford"),
        F.round((p_obs - p_ben) * (p_obs - p_ben) / p_ben * F.col("t"), 6).alias(
            "chi2_contrib"
        ),
    )


@_register(
    "q168_referential_integrity",
    """
    WITH checks AS (
      SELECT 'lineitem_orphan_order' AS check_name,
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_bad,
             (SELECT count(*) FROM lineitem) AS n_total
      UNION ALL
      SELECT 'order_orphan_customer',
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT count(*) FROM orders)
      UNION ALL
      SELECT 'customer_orphan_nation',
             (SELECT count(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey)),
             (SELECT count(*) FROM customer)
      UNION ALL
      SELECT 'lineitem_orphan_part',
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)),
             (SELECT count(*) FROM lineitem)
      UNION ALL
      SELECT 'lineitem_orphan_supplier',
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey)),
             (SELECT count(*) FROM lineitem)
    )
    SELECT check_name,
           CAST(n_bad AS BIGINT)   AS n_violations,
           CAST(n_total AS BIGINT) AS n_rows,
           round(n_bad::DOUBLE / n_total, 6) AS violation_rate
    FROM checks
    """,
)
def q168_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign key
    in the star schema (lineitem→orders/part/supplier,
    orders→customer, customer→nation) — the data-quality gate a
    warehouse runs after every load.  Scale shape: each FACT table is
    scanned ONCE — all its FK probes are broadcast left joins whose
    null-flags feed one aggregate (the naive per-check anti-join form
    scans lineitem six times; this is 3 scans for 5 checks, and at
    100 TB fact scans are the entire cost).  All counts exact; output
    is one row per constraint."""
    def dim_keys(dim, dim_key, alias):
        return (
            _t(spark, sf_dir, dim)
            .select(F.col(dim_key).alias(alias))
            .distinct()
            .withColumn(f"__hit_{alias}", F.lit(1))
        )

    def check_rows(fact, joins, checks):
        """ONE scan of the fact table: every FK probed via a broadcast
        left join null-flag, all violation counts + the total in a
        single aggregate — 6 scans collapse to 3 (one per fact)."""
        f = _t(spark, sf_dir, fact).select(*[k for k, _, _, _ in joins])
        for fact_key, dim, dim_key, _name in joins:
            f = f.join(
                F.broadcast(dim_keys(dim, dim_key, fact_key)), fact_key, "left"
            )
        aggs = [F.count(F.lit(1)).alias("n_total")]
        for fact_key, _dim, _dk, name in joins:
            aggs.append(
                F.sum(
                    F.when(F.col(f"__hit_{fact_key}").isNull(), 1).otherwise(0)
                ).alias(name)
            )
        one = f.agg(*aggs)
        rows = []
        for _fk, _dim, _dk, name in joins:
            rows.append(
                F.struct(
                    F.lit(name).alias("check_name"),
                    F.col(name).cast("bigint").alias("n_violations"),
                    F.col("n_total").cast("bigint").alias("n_rows"),
                    F.round(F.col(name) / F.col("n_total"), 6).alias(
                        "violation_rate"
                    ),
                )
            )
        return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

    li = check_rows(
        "lineitem",
        [
            ("l_orderkey", "orders", "o_orderkey", "lineitem_orphan_order"),
            ("l_partkey", "part", "p_partkey", "lineitem_orphan_part"),
            ("l_suppkey", "supplier", "s_suppkey", "lineitem_orphan_supplier"),
        ],
        None,
    )
    od = check_rows(
        "orders",
        [("o_custkey", "customer", "c_custkey", "order_orphan_customer")],
        None,
    )
    cu = check_rows(
        "customer",
        [("c_nationkey", "nation", "n_nationkey", "customer_orphan_nation")],
        None,
    )
    return li.union(od).union(cu)


@_register(
    "q169_iqr_fences",
    """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    q AS (
      SELECT event_type,
             quantile_cont(c, 0.25) AS q1,
             quantile_cont(c, 0.75) AS q3
      FROM e GROUP BY event_type
    )
    SELECT e.event_type                       AS event_type,
           CAST(count(*) AS BIGINT)           AS n_values,
           round(q.q1 / 100, 6)               AS q1,
           round(q.q3 / 100, 6)               AS q3,
           CAST(sum(CASE WHEN e.c < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(sum(CASE WHEN e.c > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM e JOIN q ON q.event_type = e.event_type
    GROUP BY e.event_type, q.q1, q.q3
    """,
)
def q169_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outlier census per event type: exact quartiles on
    integer cents, then counts outside the 1.5-IQR fences — the
    boxplot/data-validation primitive (complement of q166's MAD score:
    this one counts per group, that one ranks rows).  Scale shape: the
    5-row quartile frame broadcasts back onto one pass of the fact;
    fence comparisons are int-vs-exact-fraction, counts exact."""
    e = _t(spark, sf_dir, "events").where(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("c")
    )
    q = e.groupBy("event_type").agg(
        F.expr("percentile(c, 0.25)").alias("q1"),
        F.expr("percentile(c, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.sum(
                F.when(F.col("c") < F.col("q1") - 1.5 * iqr, 1).otherwise(0)
            ).cast("bigint").alias("n_low_outliers"),
            F.sum(
                F.when(F.col("c") > F.col("q3") + 1.5 * iqr, 1).otherwise(0)
            ).cast("bigint").alias("n_high_outliers"),
        )
        .select(
            "event_type",
            "n_values",
            F.round(F.col("q1") / 100, 6).alias("q1"),
            F.round(F.col("q3") / 100, 6).alias("q3"),
            "n_low_outliers",
            "n_high_outliers",
        )
    )


@_register(
    "q170_cohort_set_algebra",
    """
    WITH w1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
    ),
    w2 AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
    ),
    w3 AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22'
    ),
    loyal AS (SELECT user_id FROM w1 INTERSECT SELECT user_id FROM w2),
    churned AS (SELECT user_id FROM loyal EXCEPT SELECT user_id FROM w3)
    SELECT CAST(user_id AS BIGINT) AS user_id, 'churned_after_2w' AS cohort
    FROM churned
    UNION ALL
    SELECT CAST(user_id AS BIGINT), 'retained_3w'
    FROM (SELECT user_id FROM loyal INTERSECT SELECT user_id FROM w3) r
    """,
)
def q170_cohort_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort set algebra via INTERSECT / EXCEPT: purchasers active in
    weeks 1 AND 2, split into churned (absent week 3) vs retained
    (present week 3) — the set-operation API surface
    (intersect/exceptAll compile to semi/anti joins, never
    materialized sets).  Scale shape: each weekly cohort collapses to
    distinct keys map-side before any set op; the time filters push to
    the scan."""
    ev = _t(spark, sf_dir, "events")

    def week(lo, hi):
        return (
            ev.where(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .select("user_id")
            .distinct()
        )

    w1 = week("2024-01-01", "2024-01-08")
    w2 = week("2024-01-08", "2024-01-15")
    w3 = week("2024-01-15", "2024-01-22")
    loyal = w1.intersect(w2)
    churned = loyal.exceptAll(w3).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.lit("churned_after_2w").alias("cohort"),
    )
    retained = loyal.intersect(w3).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.lit("retained_3w").alias("cohort"),
    )
    return churned.union(retained)


@_register(
    "q171_segment_rank_profile",
    """
    WITH rev AS (
      SELECT c.c_mktsegment, c.c_custkey,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rc
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey
    ),
    ranked AS (
      SELECT c_mktsegment, c_custkey, rc,
             row_number()   OVER w AS rn,
             percent_rank() OVER w AS pr,
             cume_dist()    OVER w AS cd,
             count(*) OVER (PARTITION BY c_mktsegment) AS n_seg
      FROM rev
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY rc DESC, c_custkey)
    )
    SELECT c_mktsegment              AS segment,
           CAST(c_custkey AS BIGINT) AS top_custkey,
           round(rc::DOUBLE / 100, 2) AS revenue,
           CAST(n_seg AS BIGINT)     AS n_customers,
           round(pr, 6)              AS pct_rank,
           round(cd, 6)              AS cume_dist
    FROM ranked WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
)
def q171_segment_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface (row_number / percent_rank / cume_dist
    in one window): top-3 customers by revenue within each market
    segment, with their exact rank percentiles — the leaderboard +
    distribution-position report.  Scale shape: revenue rollup and
    ranking share the segment partition (parallel per-segment sorts,
    no global ordering); percent_rank/cume_dist need the whole
    partition so no WindowGroupLimit applies — at 100 TB the top-3
    would instead pre-prune via a row_number-only first pass.
    The percentiles are exact rational functions of integer ranks —
    deterministic with the unique tiebreak."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "rc"
            )
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("rc").desc(), F.col("c_custkey")
    )
    ranked = rev.select(
        "c_mktsegment",
        "c_custkey",
        "rc",
        F.row_number().over(w).alias("rn"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n_seg"),
    )
    return (
        ranked.where(F.col("rn") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_custkey").cast("bigint").alias("top_custkey"),
            F.round(F.col("rc") / 100, 2).alias("revenue"),
            F.col("n_seg").cast("bigint").alias("n_customers"),
            F.round("pr", 6).alias("pct_rank"),
            F.round("cd", 6).alias("cume_dist"),
        )
        .orderBy("segment", F.col("revenue").desc(), "top_custkey")
    )


@_register(
    "q172_order_fill_rate",
    """
    WITH f AS (
      SELECT o.o_orderkey,
             count(*) AS n_items,
             sum(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS n_fast
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    )
    SELECT CAST(n_items AS BIGINT)            AS n_items,
           CAST(count(*) AS BIGINT)           AS n_orders,
           CAST(sum(n_fast) AS BIGINT)        AS n_fast_items,
           round(sum(n_fast)::DOUBLE / sum(n_items), 6) AS fill_rate_90d,
           CAST(sum(CASE WHEN n_fast = n_items THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fully_filled
    FROM f GROUP BY n_items
    """,
)
def q172_order_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order fill-rate matrix: per order-size bucket, how many lineitems
    shipped within 90 days of ordering and how many orders filled
    completely — the fulfillment-SLA report.  Scale shape: one
    co-partitioned key join + per-order aggregate, then a tiny
    second agg on the order-size key; the 90-day test is evaluated
    map-side inside the first aggregate.  All ratios from exact
    integer counts."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    f = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.when(
                    F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("n_fast"),
        )
    )
    return f.groupBy("n_items").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("n_fast").cast("bigint").alias("n_fast_items"),
        F.round(F.sum("n_fast") / F.sum("n_items"), 6).alias("fill_rate_90d"),
        F.sum(F.when(F.col("n_fast") == F.col("n_items"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fully_filled"),
    ).select(
        F.col("n_items").cast("bigint").alias("n_items"),
        "n_orders",
        "n_fast_items",
        "fill_rate_90d",
        "n_fully_filled",
    )


@_register(
    "q173_join_key_skew",
    """
    WITH k AS (
      SELECT l_partkey AS key, count(*) AS n FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT sum(n) AS t, count(*) AS n_keys, max(n) AS mx,
             sum(n * n) AS ss
      FROM k
    )
    SELECT CAST(k.key AS BIGINT)           AS key,
           CAST(k.n AS BIGINT)             AS n_rows,
           round(k.n::DOUBLE / tot.t, 6)   AS row_share,
           round(k.n::DOUBLE * tot.n_keys / tot.t, 6) AS skew_factor,
           round(tot.ss::DOUBLE * tot.n_keys / (tot.t * tot.t), 6)
               AS table_skew_index
    FROM k CROSS JOIN tot
    ORDER BY k.n DESC, k.key LIMIT 10
    """,
)
def q173_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the 10 hottest l_partkey values with
    their row share, per-key skew factor (count / mean count) and the
    table-level skew index sum(n^2)*K/T^2 (=1 uniform, >>1 skewed) —
    the report that decides whether a join needs salting or an AQE
    skew split (operators/skew.py).  Scale shape: one
    partial-aggregable key count, a 4-scalar broadcast, top-k —
    the diagnosis costs one pass, which is the point: measure before
    salting.  All measures ratios of exact integers."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    k = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = k.agg(
        F.sum("n").alias("t"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            F.col("key").cast("bigint").alias("key"),
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(F.col("n") / F.col("t"), 6).alias("row_share"),
            F.round(F.col("n") * F.col("n_keys") / F.col("t"), 6).alias(
                "skew_factor"
            ),
            F.round(
                F.col("ss") * F.col("n_keys") / (F.col("t") * F.col("t")), 6
            ).alias("table_skew_index"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(10)
    )


@_register(
    "q318_duplicated_spans",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS gram
      FROM d, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, p FROM g JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 4
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS iid
      FROM isl
    ),
    spans AS (
      SELECT doc_id, iid, max(p) - min(p) + 4 AS span_toks
      FROM isl2 GROUP BY doc_id, iid
    ),
    tl AS (SELECT doc_id, len(w) AS n_toks FROM d)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(s.span_toks) AS BIGINT) AS max_span,
           CAST(sum(s.span_toks) AS BIGINT) AS covered_tokens,
           CAST(any_value(tl.n_toks) AS BIGINT) AS n_tokens,
           round(sum(s.span_toks) * 1.0 / any_value(tl.n_toks), 6) AS dup_frac
    FROM spans s JOIN tl ON tl.doc_id = s.doc_id
    GROUP BY s.doc_id
    """,
)
def q318_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-SPAN statistics (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the maximal token spans covered by 4-grams that appear in
    ≥2 documents — the signal that drives span-level (not whole-doc)
    dedup of a pretraining corpus.  Where q93 flags documents sharing a
    gram with a benchmark, this measures HOW MUCH of each document is
    boilerplate shared with the rest of the corpus (max_span ≈ a quoted
    passage; dup_frac ≈ templating).

    Shape: grams explode with their POSITION; the duplicated-gram set
    comes from one df aggregate (no pair join — duplication is a
    property of the gram, not the doc pair); per-doc spans are a
    gaps-and-islands pass over hit positions (two windows partitioned
    by doc), merging intervals whose starts are ≤4 apart (4-gram
    intervals [p, p+3] overlap or touch exactly when the next start is
    within 4), so covered_tokens is the EXACT union length.  split()
    is staged per the q93/q264 HOF lesson.  Everything is exact
    integers; dup_frac is one rounded ratio.

    Measured-but-rejected (r8): localCheckpoint'ing the exploded gram
    frame (it feeds both the df aggregate and the hit join) saved ~1.2×
    at sf1 — but the exploded frame is ~50× the text bytes, and at
    100 TB materializing it to executor storage loses to recomputing a
    scan+split+explode projection; the two passes stay.

    r9: served from the persisted incremental span-gram artifact
    (operators/spans.py) — the shared tokenize+explode+gram-incidence
    pass that dominated q318 AND q319 AND the scrub action persists
    once per corpus version and folds ±deltas on rewrite (the lexical
    index discipline).  The oracle is unchanged and from-scratch, so
    artifact-served results stay pinned bit-identical."""
    from stock_ops_spark.operators.spans import duplicated_spans, span_state_cached

    d = _t(spark, sf_dir, "documents")
    art = span_state_cached(
        d, source_path=catalog.table_path(sf_dir, "documents")
    )
    return duplicated_spans(art["postings"], art["gramstats"], art["docstats"])


@_register(
    "q319_span_scrub_savings",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS gram
      FROM d, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    canon AS (
      SELECT gram, min(doc_id) AS keep_doc
      FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT g.doc_id, g.p
      FROM g JOIN canon c ON c.gram = g.gram AND g.doc_id <> c.keep_doc
    ),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 4
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS iid
      FROM isl
    ),
    spans AS (
      SELECT doc_id, iid, max(p) - min(p) + 4 AS span_toks
      FROM isl2 GROUP BY doc_id, iid
    ),
    per_doc AS (
      SELECT doc_id, sum(span_toks) AS removable
      FROM spans GROUP BY doc_id
    ),
    tot AS (SELECT sum(len(w)) AS n_tokens, count(*) AS n_docs FROM d)
    SELECT CAST(tot.n_docs AS BIGINT) AS n_docs,
           CAST(tot.n_tokens AS BIGINT) AS n_tokens,
           CAST(count(per_doc.doc_id) AS BIGINT) AS n_docs_touched,
           CAST(coalesce(sum(per_doc.removable), 0) AS BIGINT)
             AS removable_tokens,
           round(coalesce(sum(per_doc.removable), 0) * 1.0 / tot.n_tokens, 6)
             AS savings_frac
    FROM tot LEFT JOIN per_doc ON TRUE
    GROUP BY tot.n_docs, tot.n_tokens
    """,
)
def q319_span_scrub_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION twin of q318's measurement: corpus-level token savings
    of an ExactSubstr-style span scrub that keeps each duplicated
    4-gram's occurrence in its CANONICAL document (min doc_id over the
    gram's documents) and removes every other occurrence's span.  This
    is the number a curation pipeline budgets before running the scrub
    — removable_tokens / n_tokens is the dedup headroom of the corpus.

    Shape: one gram-df aggregate produces (gram → canonical doc); hits
    are the non-canonical occurrences (an equi-join with an inequality
    residual, never a pair join); spans union exactly via the q318
    gaps-and-islands pass; the final frame is ONE row of exact
    integers.

    r9: served from the persisted incremental span-gram artifact (see
    q318); the from-scratch oracle pins the artifact path
    bit-identical."""
    from stock_ops_spark.operators.spans import scrub_savings, span_state_cached

    d = _t(spark, sf_dir, "documents")
    art = span_state_cached(
        d, source_path=catalog.table_path(sf_dir, "documents")
    )
    return scrub_savings(art["postings"], art["gramstats"], art["docstats"])


@_register(
    "q320_span_scrub_stats",
    """
    WITH d AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS gram
      FROM d, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    canon AS (
      SELECT gram, min(doc_id) AS keep_doc
      FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT g.doc_id, g.p
      FROM g JOIN canon c ON c.gram = g.gram AND g.doc_id <> c.keep_doc
    ),
    rem AS (
      SELECT DISTINCT doc_id, p + o AS pos
      FROM hits, unnest([0, 1, 2, 3]) AS u(o)
    ),
    toks AS (
      SELECT doc_id, i AS p, w[i] AS tok
      FROM d, unnest(range(1, len(w) + 1)) AS t(i)
    ),
    kept AS (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.pos = t.p
      WHERE r.pos IS NULL
    ),
    scrub AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text2,
             count(*) AS n_after
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS BIGINT) AS n_tokens_before,
           CAST(coalesce(s.n_after, 0) AS BIGINT) AS n_tokens_after,
           CAST(len(d.w) - coalesce(s.n_after, 0) AS BIGINT)
             AS removed_tokens,
           md5(coalesce(s.text2, '')) AS scrub_fp
    FROM d LEFT JOIN scrub s ON s.doc_id = d.doc_id
    """,
)
def q320_span_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrub ACTION executed (operators/spans.py::scrub_spans —
    Lee et al.'s ExactSubstr output, not just its budget): every token
    covered by a duplicated span outside the gram's canonical document
    is removed, and the per-doc output row carries exact before/after
    token accounting plus the md5 of the SCRUBBED TEXT ITSELF — so the
    oracle pins the actual byte content of the rewritten corpus, not
    merely its statistics.  Serves from the same persisted incremental
    span-gram artifact as q318/q319 (one corpus pass shared by all
    three); the DuckDB twin rebuilds everything from scratch, pinning
    the artifact path end-to-end.

    Scale shape: removed positions are an xNGRAM explode of the hit set
    (bounded by duplicated text volume, not corpus volume), one
    collect_set per touched doc (bounded by doc length), and the text
    rewrite is a map-side array filter — no pair join anywhere."""
    from stock_ops_spark.operators.spans import scrub_spans, span_state_cached

    d = _t(spark, sf_dir, "documents")
    art = span_state_cached(
        d, source_path=catalog.table_path(sf_dir, "documents")
    )
    sc = scrub_spans(
        d, postings=art["postings"], gramstats=art["gramstats"]
    )
    return sc.select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_after",
        "removed_tokens",
        F.md5(F.col("text")).alias("scrub_fp"),
    )


@_register(
    "q324_surgical_decontamination",
    """
    WITH d AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
      WHERE doc_id % 23 <> 0
    ),
    b AS (
      SELECT string_split(text, ' ') AS w FROM documents
      WHERE doc_id % 23 = 0
    ),
    bg AS (
      SELECT DISTINCT array_to_string(w[i:i+3], ' ') AS gram
      FROM b, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    g AS (
      SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS gram
      FROM d, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    hits AS (SELECT g.doc_id, g.p FROM g JOIN bg USING (gram)),
    rem AS (
      SELECT DISTINCT doc_id, p + o AS pos
      FROM hits, unnest([0, 1, 2, 3]) AS u(o)
    ),
    toks AS (
      SELECT doc_id, i AS p, w[i] AS tok
      FROM d, unnest(range(1, len(w) + 1)) AS t(i)
    ),
    kept AS (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.pos = t.p
      WHERE r.pos IS NULL
    ),
    scrub AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text2,
             count(*) AS n_after
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS BIGINT) AS n_tokens_before,
           CAST(coalesce(s.n_after, 0) AS BIGINT) AS n_tokens_after,
           CAST(len(d.w) - coalesce(s.n_after, 0) AS BIGINT)
             AS removed_tokens,
           md5(coalesce(s.text2, '')) AS scrub_fp
    FROM d LEFT JOIN scrub s ON s.doc_id = d.doc_id
    """,
)
def q324_surgical_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURGICAL decontamination executed
    (operators/spans.py::scrub_spans_against): every training-corpus
    token span covered by a 4-gram that also occurs in the held-out
    benchmark slice (doc_id % 23 — the q93/q260 convention) is excised;
    the document survives.  Where q93 FLAGS and the funnel DROPS a
    contaminated document whole, this keeps the scarce training text
    and removes exactly the leaked passage — per-doc accounting plus
    the md5 of the scrubbed text pins the output bytes.  The benchmark
    gram set broadcasts; the corpus is never shuffled by gram.

    Served from the persisted span artifact: BOTH sides' grams are
    row-filters over the one postings table (train = doc_id % 23 != 0,
    benchmark = the complement) — no re-tokenize of either split."""
    from stock_ops_spark.operators.spans import (
        scrub_spans_against,
        span_state_cached,
    )

    full = _t(spark, sf_dir, "documents")
    art = span_state_cached(
        full, source_path=catalog.table_path(sf_dir, "documents")
    )
    train = full.select("doc_id", "text").where(F.col("doc_id") % 23 != 0)
    sc = scrub_spans_against(
        train,
        None,
        postings=art["postings"].where(F.col("doc_id") % 23 != 0),
        ref_grams=art["postings"]
        .where(F.col("doc_id") % 23 == 0)
        .select("gram")
        .distinct(),
    )
    return sc.select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_after",
        "removed_tokens",
        F.md5(F.col("text")).alias("scrub_fp"),
    )


@_register(
    "q326_long_span_stats",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS gram
      FROM d, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, p FROM g JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 4
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS iid
      FROM isl
    ),
    spans AS (
      SELECT doc_id, iid, max(p) - min(p) + 4 AS span_toks
      FROM isl2 GROUP BY doc_id, iid
      HAVING max(p) - min(p) + 4 >= 12
    ),
    tl AS (SELECT doc_id, len(w) AS n_toks FROM d)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(s.span_toks) AS BIGINT) AS max_span,
           CAST(sum(s.span_toks) AS BIGINT) AS covered_tokens,
           CAST(any_value(tl.n_toks) AS BIGINT) AS n_tokens,
           round(sum(s.span_toks) * 1.0 / any_value(tl.n_toks), 6) AS dup_frac
    FROM spans s JOIN tl ON tl.doc_id = s.doc_id
    GROUP BY s.doc_id
    """,
)
def q326_long_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q318 with Lee et al.'s MINIMUM SPAN LENGTH knob (their production
    threshold is 50 tokens; 12 here at fixture scale): spans shorter
    than min_span are dropped AFTER the exact island merge, so coverage
    counts only passages long enough to be real duplication — the
    filter that separates templated boilerplate (scrub it) from
    incidental 4-gram collisions in a small vocabulary (leave them).
    Served from the same persisted span artifact as q318/q319/q320;
    thresholding is a post-merge row filter, so the shared corpus pass
    is unchanged."""
    from stock_ops_spark.operators.spans import duplicated_spans, span_state_cached

    d = _t(spark, sf_dir, "documents")
    art = span_state_cached(
        d, source_path=catalog.table_path(sf_dir, "documents")
    )
    return duplicated_spans(
        art["postings"], art["gramstats"], art["docstats"], min_span=12
    )


@_register(
    "q327_long_span_scrub",
    """
    WITH d AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS gram
      FROM d, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    canon AS (
      SELECT gram, min(doc_id) AS keep_doc
      FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT g.doc_id, g.p
      FROM g JOIN canon c ON c.gram = g.gram AND g.doc_id <> c.keep_doc
    ),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 4
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS iid
      FROM isl
    ),
    spans AS (
      SELECT doc_id, min(p) AS lo, max(p) + 3 AS hi
      FROM isl2 GROUP BY doc_id, iid
      HAVING max(p) - min(p) + 4 >= 12
    ),
    rem AS (
      SELECT DISTINCT doc_id, lo + o AS pos
      FROM spans, unnest(range(0, hi - lo + 1)) AS u(o)
    ),
    toks AS (
      SELECT doc_id, i AS p, w[i] AS tok
      FROM d, unnest(range(1, len(w) + 1)) AS t(i)
    ),
    kept AS (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.pos = t.p
      WHERE r.pos IS NULL
    ),
    scrub AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text2,
             count(*) AS n_after
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS BIGINT) AS n_tokens_before,
           CAST(coalesce(s.n_after, 0) AS BIGINT) AS n_tokens_after,
           CAST(len(d.w) - coalesce(s.n_after, 0) AS BIGINT)
             AS removed_tokens,
           md5(coalesce(s.text2, '')) AS scrub_fp
    FROM d LEFT JOIN scrub s ON s.doc_id = d.doc_id
    """,
)
def q327_long_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THRESHOLDED scrub executed — q320 with Lee et al.'s
    minimum-span filter (production 50; 12 at fixture scale): islands
    merge first, only spans at least min_span tokens long are excised,
    incidental short matches survive.  This is the scrub a production
    pipeline actually runs — removing every 4-token collision (q320)
    over-scrubs small-vocabulary corpora, as the delta between q320's
    and this query's removed_tokens measures directly.  Served from the
    persisted span artifact; the oracle replays island-merge +
    threshold + excision from scratch and pins the scrubbed bytes."""
    from stock_ops_spark.operators.spans import scrub_spans, span_state_cached

    d = _t(spark, sf_dir, "documents")
    art = span_state_cached(
        d, source_path=catalog.table_path(sf_dir, "documents")
    )
    sc = scrub_spans(
        d, postings=art["postings"], gramstats=art["gramstats"], min_span=12
    )
    return sc.select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_after",
        "removed_tokens",
        F.md5(F.col("text")).alias("scrub_fp"),
    )


@_register(
    "q328_streaming_span_state_served",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS gram
      FROM d, unnest(range(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 4
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, p FROM g JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 4
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS iid
      FROM isl
    ),
    spans AS (
      SELECT doc_id, iid, max(p) - min(p) + 4 AS span_toks
      FROM isl2 GROUP BY doc_id, iid
    ),
    tl AS (SELECT doc_id, len(w) AS n_toks FROM d)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(s.span_toks) AS BIGINT) AS max_span,
           CAST(sum(s.span_toks) AS BIGINT) AS covered_tokens,
           CAST(any_value(tl.n_toks) AS BIGINT) AS n_tokens,
           round(sum(s.span_toks) * 1.0 / any_value(tl.n_toks), 6) AS dup_frac
    FROM spans s JOIN tl ON tl.doc_id = s.doc_id
    GROUP BY s.doc_id
    """,
)
def q328_streaming_span_state_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ONE span state, TWO write paths, end-to-end and driver-oracled
    (VERDICT r9 #2): the documents corpus arrives as three STREAMING
    micro-batches into ``streaming/spans.py::StreamingSpanIndex`` —
    which folds each batch's ±delta into the SAME three tables the
    batch artifact persists (postings/docstats/gramstats; gramstats as
    log-structured partials) — and q318's per-doc duplicated-span
    frame is then served from the STREAMED state.  The oracle is
    q318's from-scratch batch SQL, so the equality pins the whole
    unification claim: state folded batch-by-batch equals one
    batch-mode pass over the union, bit-identical through the island
    merge and the rounded ratio.  Scale shape per batch: tokenize THE
    BATCH only, probe its grams against the merged gramstats view
    (shuffle of the batch side, never a corpus rescan), append-only
    state writes.

    COST NOTE (sf1 idle min-of-3: 25.8 s, r11): this entry replays the
    ENTIRE 3-batch ingest history per run — three sequenced 35k-doc
    micro-batches whose cost is the WORK (per batch profiled:
    tokenize+postings write 2.8 s, gramstats partial 2.9 s, probe
    4.5 s), not fixed overhead — r11 cut the per-batch driver actions
    10 → 5 (one postings materialization, Observation-carried counts,
    one-pass probe; stage-jobs 33 → 16) and the replay moved only
    27.1 → 25.8 s, which is the proof.  The number to compare against
    q318's warm serve is one batch's marginal cost at production
    micro-batch sizes, where the action trim IS the cost model; the
    SCALE_CURVES span_delta exponent (0.454) and the flat
    span_stream_batch curve are the scaling adjudication."""
    import shutil
    import tempfile

    from stock_ops_spark.operators.spans import duplicated_spans
    from stock_ops_spark.streaming.spans import StreamingSpanIndex

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="sspan_")
    try:
        idx = StreamingSpanIndex(spark, root)
        for part in range(3):
            idx.process_batch(d.where(F.col("doc_id") % 3 == part))
        st = idx.state()
        out = duplicated_spans(
            st["postings"], st["gramstats"], st["docstats"]
        ).localCheckpoint(eager=True)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)
