"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: one codegen'd scan, exact; the baseline and the
  verifier for approximate variants.
- ``knn_join``: exact k-NN for a (small) query set — broadcast the queries,
  per-query top-k via ranking window.  Cost is |queries| × |corpus| but
  only one scan of the corpus and no shuffle of it.
- ``ivf_topk``: the 100 TB scale path — IVF-style coarse quantization:
  centroids = per-cluster mean (here: the label column or any precomputed
  assignment), probe the nprobe nearest centroids, brute-force only inside
  probed cells.  Centroid set is tiny → broadcast; the corpus is filtered
  by cluster id BEFORE any distance math, so a 1000-executor scan touches
  only nprobe/N of the data (with a cluster-partitioned layout this is
  partition pruning).
- ``simhash_bucketed_pairs``: SRP sign-sketch blocking for near-dup
  vector pairs: hamming-ball candidates via band equi-join, exact cosine
  verification.

All distance math is double-accumulated JVM expressions
(functions/vector.py) — deterministic, reproducible, no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_ops_spark.functions.vector import cosine, simhash64


def brute_force_topk(
    corpus: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k for ONE query vector (single-row DataFrame with `qv`)."""
    sim = cosine(F.col(vec_col), F.col("qv"))
    return (
        corpus.join(F.broadcast(query_vec))
        .select(id_col, sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact k-NN join: for every query row, its k nearest corpus rows.
    Queries are broadcast; per-query ranking is a window over the similarity
    — Spark's WindowGroupLimit keeps only k rows per query before the final
    shuffle."""
    sim = cosine(F.col(vec_col), F.col(query_vec_col))
    scored = corpus.join(
        F.broadcast(queries), F.col(id_col) != F.col(query_id_col)
    ).select(
        query_id_col, F.col(id_col).alias("neighbor_id"), sim.alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def centroids_by(
    corpus: DataFrame, cluster_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Element-wise mean vector per cluster: posexplode → avg per (cluster,
    pos) → re-assemble ordered.  One shuffle keyed by (cluster, pos)."""
    el = corpus.select(
        cluster_col, F.posexplode(vec_col).alias("pos", "val")
    )
    means = el.groupBy(cluster_col, "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m")
    )
    return (
        means.groupBy(cluster_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("pm")
        )
        .select(
            cluster_col,
            F.transform(F.col("pm"), lambda s: s.getField("m")).alias("centroid"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe centroid-nearest clusters,
    exact search inside them only."""
    cents = centroids_by(corpus, cluster_col, vec_col)
    probed = (
        cents.join(F.broadcast(query_vec))
        .select(cluster_col, cosine(F.col("centroid"), F.col("qv")).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col(cluster_col))
        .limit(nprobe)
        .select(cluster_col)
    )
    # cluster filter happens BEFORE distance math; with a
    # partitionBy(cluster) layout this is partition pruning at the scan
    narrowed = corpus.join(F.broadcast(probed), cluster_col, "left_semi")
    return brute_force_topk(narrowed, query_vec, k, id_col, vec_col)


def knn_join_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    nprobe: int = 2,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Approximate k-NN join for LARGE query sets — the scale path past
    ``knn_join``'s broadcast-small-Q precondition.

    Both sides block on the corpus's coarse quantization: each query is
    routed to its ``nprobe`` nearest centroids (centroids are tiny →
    broadcast), then queries meet corpus rows through an EQUI-join on
    cluster id — |Q| × |corpus|/N_cells work per probe instead of
    |Q| × |corpus|, and neither side is ever broadcast whole.  With a
    cluster-partitioned corpus layout the equi-join co-locates without a
    corpus shuffle.  Exactness: recall misses only neighbors whose cell
    the query didn't probe (the IVF contract; raise nprobe to trade cost
    for recall)."""
    cents = centroids_by(corpus, cluster_col, vec_col)
    qsim = cosine(F.col("centroid"), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        qsim.desc_nulls_last(), F.col(cluster_col)
    )
    routed = (
        queries.join(F.broadcast(cents))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= nprobe)
        .select(query_id_col, query_vec_col, cluster_col)
    )
    sim = cosine(F.col(vec_col), F.col(query_vec_col))
    scored = corpus.join(routed, cluster_col).where(
        F.col(id_col) != F.col(query_id_col)
    ).select(query_id_col, F.col(id_col).alias("neighbor_id"), sim.alias("cos_sim"))
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def exact_topk_cached(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    source_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    cache_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Persisted exact ground-truth top-k — ``(qid, nid)`` per query —
    for recall measurement (VERDICT r10 #1).

    The truth set is a pure function of (corpus version, query set, k):
    it does not depend on any quantizer, cell layout, or nprobe, so ONE
    artifact serves every recall measurement over the same corpus —
    q317's curve, ``ivf_index_with_refresh``'s pre- AND post-refresh
    checks (a quantizer refresh never invalidates it), quantization QA.
    Before this artifact, q317 re-ranked every (query × corpus) pair on
    each call — the single most expensive registry entry at sf1
    (34.9 s), recomputing a value that changes only when the corpus or
    the query sample does.

    Key discipline (``operators/artifacts.py``): family = source
    abspath + id/vec cols + k + v-tag; version = source identity
    (mtime+size) + an order-insensitive md5 fingerprint of the query
    rows — a corpus append or a different query sample recomputes, an
    unchanged pair serves warm from parquet with zero scoring work.

    Scoring is the ORDER-EXACT kernel of ``ivf_recall_curve`` (per-dim
    left-to-right accumulation, dot/(nc·nq) grouping — bit-identical to
    the Catalyst HOF fold), followed by the same (sim DESC, id ASC)
    row_number cut, so the cached truth is row-for-row the set the
    inline curve used to compute; a map-side partial top-k (cut at the
    batch-local kth VALUE, ties kept — provably lossless) bounds what
    crosses the shuffle to O(k·|Q|) per task.  Zero-norm rows on either
    side never enter (the HOF cosine is NULL for them and sorts last);
    rows with non-finite similarities are likewise dropped.

    ``stats``: gains ``truth_cold_build`` (False on a warm hit)."""
    import numpy as np

    from stock_ops_spark.functions.vector import norm
    from stock_ops_spark.operators import artifacts
    from stock_ops_spark.operators.ivf import _id_sql_type

    spark = corpus.sparkSession
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    qid_t = _id_sql_type(queries, query_id_col)
    nid_t = _id_sql_type(corpus, id_col)
    # order-insensitive query-set fingerprint (NULL elements encoded,
    # the _fp discipline): one tiny job over the measurement sample
    import os

    qfp = (
        queries.select(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col(query_id_col).cast("string"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.col(query_vec_col),
                            lambda x: F.coalesce(
                                x.cast("string"), F.lit("\u0000")
                            ),
                        ),
                    ),
                )
            ).alias("h")
        )
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list("h")))))
        .collect()[0][0]
    )
    fam = artifacts.cache_key(
        f"v1|{os.path.abspath(source_path)}|{id_col}|{vec_col}|k={k}"
    )
    ver = artifacts.cache_key(
        f"{artifacts.source_identity(source_path)}|{qfp}"
    )
    path = artifacts.versioned_path(
        cache_dir, "exacttopk", fam, ver, ".truth.parquet"
    )
    if os.path.isdir(path):
        if stats is not None:
            stats["truth_cold_build"] = False
        return spark.read.parquet(path)
    if stats is not None:
        stats["truth_cold_build"] = True

    qrows = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(query_vec_col).alias("qv"),
        norm(F.col(query_vec_col)).alias("nq"),
    ).collect()
    qid_np = np.int64 if qid_t == "bigint" else object
    qids = np.array([r.qid for r in qrows], dtype=qid_np)
    qm = np.array([list(r.qv) for r in qrows], dtype=np.float64)
    nq = np.array([r.nq for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((qids, qm, nq))

    def score(batches):
        import pandas as pd

        bqids, bqm, bnq = bc.value
        d = bqm.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            ids = pdf["cid"].to_numpy()
            nc = pdf["nc"].to_numpy()
            acc = np.zeros((len(ids), len(bqids)), dtype=np.float64)
            for i in range(d):  # ORDER-EXACT: the HOF fold's op order
                acc += np.outer(m[:, i], bqm[:, i])
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = acc / np.outer(nc, bnq)
            mask = (
                (ids[:, None] != bqids[None, :])
                & (nc[:, None] != 0.0)
                & (bnq[None, :] != 0.0)
            )
            simm = np.where(mask, sim, -np.inf)
            n_rows = simm.shape[0]
            if n_rows > k:
                kth = np.partition(simm, n_rows - k, axis=0)[n_rows - k]
                keep = simm >= kth[None, :]
            else:
                keep = np.ones_like(simm, dtype=bool)
            keep &= mask & np.isfinite(simm)
            ri, qi = np.nonzero(keep)
            if not len(ri):
                continue
            yield pd.DataFrame(
                {"qid": bqids[qi], "nid": ids[ri], "s": sim[ri, qi]}
            )

    scored = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("nc"),
    ).mapInPandas(score, f"qid {qid_t}, nid {nid_t}, s double")
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), F.col("nid"))
    out = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("qid", "nid")
    )
    os.makedirs(cache_dir, exist_ok=True)
    artifacts.publish(out, path)
    return spark.read.parquet(path)


def ivf_recall_curve(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobes: tuple[int, ...] = (1, 2, 4),
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    truth: DataFrame | None = None,
) -> DataFrame:
    """Measured recall@k of ``knn_join_ivf`` against exact ground truth,
    per ``nprobe`` — the number a user needs to CHOOSE nprobe rationally
    (the IVF contract trades recall for probed fraction; without the
    curve the knob is a guess).  Pair with
    ``plans/sizing.py::ivf_nprobe`` to turn a target recall into the
    smallest sufficient nprobe.

    Ground truth probes EVERY cell through the same ranking/tiebreak
    path as the approximate runs, so recall reflects only probe misses,
    never tie-ordering drift.  Output: one row per nprobe with
    (n_queries, n_truth, n_hit, recall@k micro-averaged, rounded 6dp).

    Scale shape (r8): the corpus×queries scoring pass runs ONCE — every
    candidate carries its cell's per-query rank, so each nprobe setting
    (and the truth) is a filter + per-query top-k WINDOW over the same
    checkpointed slim frame (id, neighbor, sim, cell_rank), instead of
    one full knn_join_ivf rebuild per setting.  The scoring itself is
    an ORDER-EXACT numpy kernel inside mapInPandas (the q311 lesson
    taken further): per corpus batch × label, similarities accumulate
    with an explicit per-dimension loop — acc += x_i·y_i left to right,
    then dot/(nc·nq) — reproducing the Catalyst HOF fold's float
    operation order BIT-FOR-BIT (same casts, same add order, same
    multiply/divide grouping), so the measured recall and every oracle
    hash are unchanged while the per-pair HOF allocation cost is gone
    (measured: 28.4 → 13.7 s at sf1 — the remainder was the four
    top-k window passes over the 4M-row scored frame; r11 adds a
    batch-local kth-value cut inside the kernel — lossless for every
    probe tier because all of a query's candidates in one (label ×
    batch) group share that label's cell rank — so only O(k) rows per
    (query, label, batch) cross the shuffle and the windows run over a
    frame thousands of times smaller).  The routed query set (|Q|·cells
    rows — a measurement-sized sample by contract) rides to the workers
    as a per-label dict; centroids build once.

    ``truth`` (VERDICT r10 #1): pass ``exact_topk_cached``'s frame to
    serve the ground-truth side from the persisted artifact — the
    full-corpus scoring pass then exists only for the APPROXIMATE
    sides, so the routed set is filtered to ``cellrk <= max(nprobes)``,
    unprobed cells are pruned Catalyst-side before the Python boundary,
    and the heaviest window pass (top-k over the FULL scored frame)
    disappears entirely.  The cached truth is bit-identical to the
    inline computation (same kernel, same cut — see
    ``exact_topk_cached``), so the curve is unchanged."""
    from stock_ops_spark.functions.vector import norm

    cents = centroids_by(corpus, cluster_col, vec_col).localCheckpoint(
        eager=True
    )
    qsim = cosine(F.col("centroid"), F.col(query_vec_col))
    wq = Window.partitionBy(query_id_col).orderBy(
        qsim.desc_nulls_last(), F.col(cluster_col)
    )
    # per-query cell ranks + query norms computed ONCE, Spark-side
    # (identical doubles to the per-pair fold they replace)
    routed_rows = (
        queries.join(F.broadcast(cents))
        .withColumn("__cellrk", F.row_number().over(wq))
        .select(
            F.col(query_id_col).alias("qid"),
            F.col(query_vec_col).alias("qv"),
            F.col(cluster_col).alias("lab"),
            "__cellrk",
            norm(F.col(query_vec_col)).alias("nq"),
        )
        .collect()
    )
    import numpy as np

    by_label: dict = {}
    for r in routed_rows:
        by_label.setdefault(r["lab"], []).append(
            (r["qid"], r["qv"], r["nq"], r["__cellrk"])
        )
    routed_np = {
        lab: (
            np.array([x[0] for x in v], dtype=np.int64),
            np.array([x[1] for x in v], dtype=np.float64),
            np.array([x[2] for x in v], dtype=np.float64),
            np.array([x[3] for x in v], dtype=np.int64),
        )
        for lab, v in by_label.items()
    }
    if truth is not None:
        maxp = max(nprobes)
        pruned = {}
        for lab, (aq, am, an, ar) in routed_np.items():
            sel = ar <= maxp
            if sel.any():
                pruned[lab] = (aq[sel], am[sel], an[sel], ar[sel])
        routed_np = pruned
        corpus = corpus.where(F.col(cluster_col).isin(list(pruned.keys())))
    # r9 (advice): ship the routed-query dict as a TorrentBroadcast —
    # one copy per executor instead of one per task closure, so task
    # serialization stays O(1) as the measurement sample grows
    routed_bc = corpus.sparkSession.sparkContext.broadcast(routed_np)

    def score(batches):
        import pandas as pd

        routed = routed_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            for lab, grp in pdf.groupby("lab"):
                ent = routed.get(lab)
                if ent is None:
                    continue
                qids, qm, nq, crk = ent
                cm = np.stack(grp["cv"].to_numpy()).astype(np.float64)
                cids = grp["cid"].to_numpy()
                nc = grp["nc"].to_numpy()
                d = cm.shape[1]
                # ORDER-EXACT accumulation: per pair, acc += x_i*y_i
                # left to right — the HOF fold's exact float op order
                # (np.matmul would reorder the sum and drift last bits)
                acc = np.zeros((len(cids), len(qids)), dtype=np.float64)
                for i in range(d):
                    acc += np.outer(cm[:, i], qm[:, i])
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = acc / np.outer(nc, nq)  # dot/(nc*nq), same grouping
                # r9 (advice): a zero-norm vector on either side makes
                # the Catalyst cosine NULL, which sorts LAST under the
                # descending window — but inf/NaN here would sort FIRST.
                # Emit no candidate for such pairs: a row that can never
                # enter top-k under NULL-last semantics must not enter
                # the measured curve either.
                mask = (
                    (cids[:, None] != qids[None, :])
                    & (nc[:, None] != 0.0)
                    & (nq[None, :] != 0.0)
                )
                # r11: batch-local top-k cut, lossless for EVERY tier.
                # Within one (label × Arrow batch) group, all candidates
                # of a query share that label's cell rank, so for any
                # nprobe tier (and for the all-cells truth) the query's
                # winners from this group are a subset of its top-k BY
                # VALUE here — cut at the kth value, ties kept (the
                # blocked-kernel argument).  Only O(k) rows per (query,
                # label, batch) cross the shuffle instead of every pair.
                simm = np.where(mask, sim, -np.inf)
                nr = simm.shape[0]
                if nr > k:
                    kth = np.partition(simm, nr - k, axis=0)[nr - k]
                    keep = simm >= kth[None, :]
                else:
                    keep = np.ones_like(simm, dtype=bool)
                keep &= mask & np.isfinite(simm)
                ti, qi = np.nonzero(keep)
                if not len(ti):
                    continue
                yield pd.DataFrame(
                    {
                        "__q": qids[qi],
                        "__n": cids[ti],
                        "__s": sim[ti, qi],
                        "__cellrk": crk[qi],
                    }
                )

    scored = (
        corpus.select(
            F.col(cluster_col).alias("lab"),
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv"),
            norm(F.col(vec_col)).alias("nc"),
        )
        .mapInPandas(
            score, "__q long, __n long, __s double, __cellrk long"
        )
        .localCheckpoint(eager=True)
    )

    def _topk(df):
        w = Window.partitionBy("__q").orderBy(F.col("__s").desc(), F.col("__n"))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select("__q", "__n")
        )

    if truth is None:
        truth = _topk(scored).localCheckpoint(eager=False)
    else:
        truth = truth.select(
            F.col("qid").alias("__q"), F.col("nid").alias("__n")
        )
    out = None
    for nprobe in nprobes:
        approx = _topk(scored.where(F.col("__cellrk") <= nprobe))
        hit = truth.join(approx, ["__q", "__n"], "left_semi")
        row = truth.agg(
            F.countDistinct("__q").alias("n_queries"),
            F.count(F.lit(1)).alias("n_truth"),
        ).crossJoin(
            F.broadcast(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        ).select(
            F.lit(nprobe).cast("bigint").alias("nprobe"),
            F.col("n_queries").cast("bigint").alias("n_queries"),
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(
                F.try_divide(F.col("n_hit"), F.col("n_truth")), 6
            ).alias("recall_at_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def grid_self_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "vec_id",
    grid: int = 4,
) -> DataFrame:
    """All ordered pairs (a, b) with ``a.id < b.id`` inside each block,
    with every join task bounded to a (cell/grid)² sub-square.

    A plain self-equi-join on the block key materializes each block's full
    n² pair set in ONE task — a single hot block at 100 TB becomes one
    quadratic straggler.  Grid decomposition keeps the semantics exact
    (every pair still produced exactly once) while bounding task size:
    each row is hashed into one of ``grid`` cells, each side is replicated
    ``grid`` ways carrying the partner cell id, and the equi-join key
    becomes (block, ga, gb) — so the hot block splits into grid² cells of
    (n/grid)² pairs each, spread across the cluster.  Replication cost is
    grid× per side; total pair work is unchanged (it is inherent to exact
    all-pairs semantics — use LSH/simhash banding when the threshold
    permits a lossy candidate stage).

    Returns columns: ``block_cols…, a (struct of df row), b (struct)``.
    """
    cell = F.pmod(F.xxhash64(F.col(id_col)), F.lit(grid))
    partner = F.explode(F.array(*[F.lit(i) for i in range(grid)]))
    payload = F.struct(*[F.col(c) for c in df.columns])
    a = df.select(
        *block_cols, payload.alias("a"), cell.alias("ga"), partner.alias("gb")
    )
    b = df.select(
        *block_cols, payload.alias("b"), partner.alias("ga"), cell.alias("gb")
    )
    return a.join(b, [*block_cols, "ga", "gb"]).where(
        F.col("a").getField(id_col) < F.col("b").getField(id_col)
    ).drop("ga", "gb")


def simhash_bucketed_pairs(
    corpus: DataFrame,
    max_hamming: int = 8,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup vector pairs: 64-bit sign sketch, split into ``bands``
    16-bit bands — pairs within hamming ≤ max_hamming share ≥1 exact band
    w.h.p. (pigeonhole: hamming < bands ⇒ certainty) — then exact hamming
    filter.  Equi-join on band value; no all-pairs product."""
    bits = 64 // bands
    sk = corpus.select(
        F.col(id_col).alias("id"), simhash64(F.col(vec_col)).alias("sk")
    )
    stacked = sk.select(
        "id",
        "sk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sk"), b * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sk", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    l, r = stacked.alias("l"), stacked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sk").bitwiseXOR(F.col("r.sk"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


def knn_join_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Cell-blocked exact k-NN join scored by the blocked numpy kernel
    (r10): both sides carry a cell id (``cluster_col`` — a label, an
    IVF cell, any blocker), queries ship to executors as per-cell
    matrices via ``sparkContext.broadcast``, and each (Arrow batch ×
    cell) scores as ONE float64 Gram matmul with batch-local top-k
    (ties kept), replacing a per-pair HOF cosine inside the equi-join.
    Self-pairs excluded; exactness argument on
    ``ivf.knn_join_from_index`` (float32 inputs → exact products; only
    summation grouping differs, ~1e-14 ≪ the 6dp oracle grid).

    Posture note (the q311 caveat applies): the query side is DRIVER-
    COLLECTED, so this kernel is for query sets bounded by contract (a
    curated query batch, a fixed eval set).  A fixed-FRACTION sample
    grows with the corpus — at the 100 TB posture either bound the
    sample or keep the pure-Catalyst equi-join path (AQE decides the
    join strategy) that this function replaces."""
    from stock_ops_spark.operators.ivf import _blocked_cell_scores

    routed = queries.select(
        query_id_col, query_vec_col, F.col(cluster_col).alias("cid")
    )
    tagged = corpus.select(
        id_col, vec_col, F.col(cluster_col).alias("cid")
    )
    scored = _blocked_cell_scores(
        tagged, None, routed, k, id_col, vec_col,
        query_id_col, query_vec_col,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
