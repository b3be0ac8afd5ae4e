"""Persisted IVF index with incremental append assignment (VERDICT r8 #2).

Contracts pinned:

- cold build == full assignment (same cells as assign_clusters over the
  whole frame against the same fit);
- append refresh assigns ONLY the delta (work counter), against FROZEN
  centroids, and equals a from-scratch assignment of the whole corpus
  against those same frozen centroids;
- change/remove retract correctly through the fingerprint detector;
- artifact-served top-k == inline ivf computation over the same cells;
- the recall-drift loop closes: after an append, ivf_recall_curve over
  the artifact's cells re-measures, and plans.sizing.ivf_nprobe picks
  from the POST-append curve.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from stock_ops_spark.operators import ivf as IVF
from stock_ops_spark.operators.clustering import assign_clusters, kmeans_fit

pytestmark = pytest.mark.usefixtures("spark")

DIM = 8


def _vectors(n: int, seed: int = 3, shift: float = 0.0):
    """Deterministic clustered vectors: 4 gaussian-ish blobs in DIM
    dims; ``shift`` moves appended points off the original modes (the
    distribution-drift knob for the recall test)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mode = i % 4
        base = [0.0] * DIM
        base[mode * 2] = 1.0
        base[mode * 2 + 1] = -1.0
        vec = [
            round(b + rng.uniform(-0.3, 0.3) + shift, 4) for b in base
        ]
        rows.append((i, vec))
    return rows


def _write(spark, rows, path):
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _assign_set(df):
    return {(r.vec_id, r.cid) for r in df.select("vec_id", "cid").collect()}


def test_cold_build_matches_full_assignment(spark, tmp_path):
    rows = _vectors(120)
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    stats: dict = {}
    idx = IVF.ivf_index_cached(
        e, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache, stats=stats
    )
    assert stats["vectors_assigned"] == 120
    cents = kmeans_fit(e, k=4, iters=2, dim=DIM)
    full = assign_clusters(e, cents).select("vec_id", "cid")
    assert _assign_set(idx["assign"]) == _assign_set(full)
    assert idx["centroids"].count() == 4


def test_append_assigns_only_delta_against_frozen_centroids(spark, tmp_path):
    rows = _vectors(120)
    src = str(tmp_path / "emb.parquet")
    v1 = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx1 = IVF.ivf_index_cached(
        v1, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    frozen = [list(r.centroid) for r in idx1["centroids"].orderBy("cid").collect()]
    rows2 = rows + [(200 + i, v) for i, (_, v) in enumerate(_vectors(12, seed=77))]
    v2 = _write(spark, rows2, src)
    stats: dict = {}
    idx2 = IVF.ivf_index_cached(
        v2, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache, stats=stats
    )
    assert stats["vectors_assigned"] == 12  # the delta, not the corpus
    # centroids carried FROZEN — byte-identical to v1's
    frozen2 = [list(r.centroid) for r in idx2["centroids"].orderBy("cid").collect()]
    assert frozen2 == frozen
    # folded assignment == from-scratch assignment against frozen cents
    full = assign_clusters(v2, frozen).select("vec_id", "cid")
    assert _assign_set(idx2["assign"]) == _assign_set(full)


def test_change_and_remove_retract_through_fingerprint(spark, tmp_path):
    rows = _vectors(80)
    src = str(tmp_path / "emb.parquet")
    v1 = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx1 = IVF.ivf_index_cached(
        v1, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    frozen = [list(r.centroid) for r in idx1["centroids"].orderBy("cid").collect()]
    # move vec 5 to a different blob; drop vecs 9 and 10
    rows2 = [
        (i, _vectors(1, seed=50, shift=2.0)[0][1]) if i == 5 else (i, v)
        for i, v in rows
        if i not in (9, 10)
    ]
    v2 = _write(spark, rows2, src)
    stats: dict = {}
    idx2 = IVF.ivf_index_cached(
        v2, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache, stats=stats
    )
    assert stats["vectors_assigned"] == 1  # only the changed vector
    full = assign_clusters(v2, frozen).select("vec_id", "cid")
    assert _assign_set(idx2["assign"]) == _assign_set(full)
    assert idx2["assign"].where(F.col("vec_id").isin(9, 10)).count() == 0


def test_served_topk_matches_inline(spark, tmp_path):
    rows = _vectors(120)
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx = IVF.ivf_index_cached(
        e, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    served = IVF.ivf_topk_from_index(
        e.where(F.col("vec_id") != 0), idx["centroids"], idx["assign"], qv,
        k=5, nprobe=2,
    ).select("vec_id", "cos_sim")
    # inline twin: same frozen cells via a joined cluster column
    from stock_ops_spark.operators.similarity import ivf_topk

    tagged = e.join(idx["assign"].select("vec_id", "cid"), "vec_id")
    inline = ivf_topk(
        tagged.where(F.col("vec_id") != 0), qv, k=5, nprobe=2,
        cluster_col="cid",
    )
    s = [(r.vec_id, round(r.cos_sim, 9)) for r in served.collect()]
    i = [(r.vec_id, round(r.cos_sim, 9)) for r in inline.collect()]
    # probe choice may differ (persisted Lloyd centroids vs per-cell
    # means) — compare against the index's own contract instead: the
    # top-k is exact WITHIN the probed cells
    probed = (
        idx["centroids"]
        .join(F.broadcast(qv))
        .select(
            "cid",
            IVF.cosine(F.col("centroid"), F.col("qv")).alias("cs"),
        )
        .orderBy(F.col("cs").desc(), "cid")
        .limit(2)
        .select("cid")
    )
    cand = (
        e.where(F.col("vec_id") != 0)
        .join(idx["assign"].select("vec_id", "cid"), "vec_id")
        .join(probed, "cid", "left_semi")
        .join(F.broadcast(qv))
        .select(
            "vec_id", IVF.cosine(F.col("embedding"), F.col("qv")).alias("cs")
        )
        .orderBy(F.col("cs").desc(), "vec_id")
        .limit(5)
    )
    expect = [(r.vec_id, round(r.cs, 9)) for r in cand.collect()]
    assert s == expect
    assert len(i) == 5  # the inline path stays runnable on tagged cells


def test_recall_drift_loop_post_append(spark, tmp_path):
    """The operational loop the artifact exists for: append drifted
    vectors, delta-assign against frozen centroids, RE-MEASURE the
    recall curve over the artifact's cells, and re-feed sizing."""
    from stock_ops_spark.operators.similarity import ivf_recall_curve
    from stock_ops_spark.plans.sizing import ivf_nprobe

    rows = _vectors(150)
    src = str(tmp_path / "emb.parquet")
    v1 = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    IVF.ivf_index_cached(v1, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache)
    # append 30 vectors drifted off the original modes
    rows2 = rows + [
        (300 + i, v) for i, (_, v) in enumerate(_vectors(30, seed=9, shift=0.8))
    ]
    v2 = _write(spark, rows2, src)
    idx = IVF.ivf_index_cached(
        v2, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    tagged = v2.join(idx["assign"].select("vec_id", "cid"), "vec_id")
    queries = tagged.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    curve_df = ivf_recall_curve(
        tagged, queries, k=5, nprobes=(1, 2, 4), cluster_col="cid"
    )
    curve = [(int(r.nprobe), float(r.recall_at_k)) for r in curve_df.collect()]
    assert len(curve) == 3
    # monotone non-decreasing, and probing ALL 4 cells is exact
    rs = [r for _, r in sorted(curve)]
    assert rs == sorted(rs)
    assert dict(curve)[4] == 1.0
    # sizing picks from the POST-append curve
    pick = ivf_nprobe(0.99, curve)
    assert pick in (1, 2, 4)
    assert dict(curve)[pick] >= 0.99


def test_fingerprint_distinguishes_null_elements(spark, tmp_path):
    """A NULLed element must CHANGE the fingerprint (r10, advice):
    concat_ws skips nulls, so without explicit encoding
    [1.0, NULL, 2.0] and [1.0, 2.0] collide and an embedding rewrite
    that nulls an element would keep its stale cell assignment."""
    df = spark.createDataFrame(
        [
            (0, [1.0, None, 2.0]),
            (1, [1.0, 2.0]),
            (2, [1.0, 2.0, None]),
            (3, [1.0, 2.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    fps = {
        r.vec_id: r.fp
        for r in df.select("vec_id", IVF._fp("embedding").alias("fp")).collect()
    }
    assert fps[0] != fps[1]
    assert fps[2] != fps[3]
    assert fps[1] == fps[3]


def test_knn_join_blocked_kernel_equals_hof(spark, tmp_path):
    """The blocked numpy kernel (VERDICT r9 #1) must produce the same
    k-NN join as the per-pair HOF path — including under adversarial
    inputs: an exact-duplicate vector pair (ties at the batch-local
    top-k boundary must be KEPT, not cut) and a zero-norm vector
    (never wins a slot on either path)."""
    rows = _vectors(140)
    rows[57] = (57, list(rows[23][1]))  # exact duplicate → cosine tie
    rows.append((900, [0.0] * DIM))     # zero-norm corpus vector
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx = IVF.ivf_index_cached(
        e, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    queries = e.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )

    def run(kernel):
        out = IVF.knn_join_from_index(
            e, idx["centroids"], idx["assign"], queries,
            k=3, nprobe=2, kernel=kernel,
        )
        return sorted(
            (r.query_id, r.neighbor_id, round(r.cos_sim, 9))
            for r in out.collect()
        )

    blocked, hof = run("blocked"), run("hof")
    assert blocked == hof
    assert len(blocked) > 0
    # zero-norm vector never appears as a neighbor
    assert all(n != 900 for _, n, _ in blocked)


def test_quantizer_refresh_fires_on_drift_and_equals_cold_build(
    spark, tmp_path
):
    """The refresh policy (VERDICT r9 #3): after appends drift the
    corpus so far off the frozen quantizer that no nprobe <= cells/2
    reaches the target, ``ivf_index_with_refresh`` must bump the
    family generation and rebuild — and the rebuilt index must equal a
    cold build at the current corpus version exactly (same Lloyd fit,
    same full assignment)."""
    rows = _vectors(120)
    src = str(tmp_path / "emb.parquet")
    v1 = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    IVF.ivf_index_cached(v1, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache)
    # drift adversarial to the FROZEN quantizer: a dense new region
    # roughly EQUIDISTANT from every old centroid, so tiny noise
    # scatters its cell membership across all 4 cells — a query there
    # has true neighbors in more cells than nprobe <= cells/2 can probe
    rng = random.Random(11)
    rows2 = rows + [
        (500 + i, [round(5.0 + rng.uniform(-0.3, 0.3), 4) for _ in range(DIM)])
        for i in range(360)
    ]
    v2 = _write(spark, rows2, src)
    queries = v2.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    stats: dict = {}
    idx = IVF.ivf_index_with_refresh(
        v2, src, queries, k_cells=4, iters=2, dim=DIM,
        target_recall=0.999, k=5, cache_dir=cache, stats=stats,
    )
    assert stats["refreshed"] is True
    assert len(stats["recall_curve"]) >= 1
    # refresh == cold build at the current corpus version
    cents_new = [
        tuple(r.centroid) for r in idx["centroids"].orderBy("cid").collect()
    ]
    cold = [tuple(c) for c in kmeans_fit(v2, k=4, iters=2, dim=DIM)]
    assert cents_new == cold
    full = assign_clusters(v2, [list(c) for c in cold]).select("vec_id", "cid")
    assert _assign_set(idx["assign"]) == _assign_set(full)
    # and the post-refresh curve was re-measured
    assert "recall_curve_after" in stats


def test_quantizer_refresh_noop_when_target_met(spark, tmp_path):
    """Control: when the measured curve meets the target within the
    probe budget, the generation must NOT move and the centroids stay
    frozen (byte-identical across the call)."""
    rows = _vectors(120)
    src = str(tmp_path / "emb.parquet")
    v1 = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx1 = IVF.ivf_index_cached(
        v1, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    frozen = [
        tuple(r.centroid) for r in idx1["centroids"].orderBy("cid").collect()
    ]
    queries = v1.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    stats: dict = {}
    idx = IVF.ivf_index_with_refresh(
        v1, src, queries, k_cells=4, iters=2, dim=DIM,
        target_recall=0.05, k=5, cache_dir=cache, stats=stats,
    )
    assert stats["refreshed"] is False
    assert "recall_curve_after" not in stats
    after = [
        tuple(r.centroid) for r in idx["centroids"].orderBy("cid").collect()
    ]
    assert after == frozen


def test_refresh_needed_rule():
    from stock_ops_spark.plans.sizing import ivf_refresh_needed

    # in-budget point meets target -> no refresh
    assert not ivf_refresh_needed([(1, 0.7), (4, 0.96)], 0.95, 8)
    # only out-of-budget points meet it -> refresh
    assert ivf_refresh_needed([(1, 0.5), (2, 0.6), (8, 0.99)], 0.95, 8)
    # empty curve -> conservative refresh
    assert ivf_refresh_needed([], 0.9, 8)
    with pytest.raises(ValueError):
        ivf_refresh_needed([(1, 0.5)], 0.0, 8)


def test_knn_join_blocked_label_cells_equals_expression_path(spark):
    """knn_join_blocked (q81's r10 path) over STRING label cells must
    equal the pure-Catalyst equi-join + per-pair cosine expression it
    replaces — including a duplicate vector (tie at top-1) and a
    zero-norm vector."""
    import random

    from stock_ops_spark.functions import vector as V
    from stock_ops_spark.operators.similarity import knn_join_blocked

    rng = random.Random(5)
    rows = [
        (i, f"lab{i % 3}", [round(rng.uniform(-1, 1), 4) for _ in range(DIM)])
        for i in range(90)
    ]
    rows[41] = (41, rows[11][1], list(rows[11][2]))  # same label, same vec
    rows.append((900, "lab0", [0.0] * DIM))
    e = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    q = e.where(F.col("vec_id") % 10 == 1).select(
        F.col("vec_id").alias("query_id"), "label",
        F.col("embedding").alias("qv"),
    )
    blocked = sorted(
        (r.query_id, r.neighbor_id, round(r.cos_sim, 9))
        for r in knn_join_blocked(e, q, k=2, cluster_col="label").collect()
    )
    from pyspark.sql import Window as W

    sim = F.try_divide(
        V.dot(F.col("embedding"), F.col("qv")),
        V.norm(F.col("embedding")) * V.norm(F.col("qv")),
    )
    scored = (
        e.join(q, "label")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                sim.alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col("neighbor_id")
    )
    hof = sorted(
        (r.query_id, r.neighbor_id, round(r.cos_sim, 9))
        for r in scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2).drop("rn").collect()
    )
    assert blocked == hof
    assert len(blocked) > 0
    assert all(n != 900 for _, n, _ in blocked)


def test_blocked_kernel_dirty_vectors_match_hof(spark, tmp_path):
    """ADVICE r10: NULL / ragged / element-NULL corpus vectors used to
    crash the blocked kernel's np.stack (job failure) where the HOF
    path yields NULL cosine that sorts last.  The kernel now DROPS such
    rows — both paths must again agree on dirty data."""
    rows = _vectors(120)
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    dirty = spark.createDataFrame(
        [
            (901, None),                    # NULL vector
            (902, [1.0] * (DIM - 2)),       # wrong dimension
            (903, [1.0, None] + [0.5] * (DIM - 2)),  # NULL element
        ],
        "vec_id long, embedding array<float>",
    )
    e_dirty = e.unionByName(dirty)
    cache = str(tmp_path / "cache")
    idx = IVF.ivf_index_cached(
        e, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    # dirty ids share cells with clean rows so the kernel actually
    # sees them: tag them onto every probed cell via the assign table
    extra = idx["assign"].select("cid").distinct().crossJoin(
        dirty.select(F.col("vec_id"), F.lit("x").alias("fp"))
    ).select("vec_id", "cid", "fp")
    assign_dirty = idx["assign"].unionByName(extra)
    queries = e.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )

    def run(kernel):
        out = IVF.knn_join_from_index(
            e_dirty, idx["centroids"], assign_dirty, queries,
            k=3, nprobe=2, kernel=kernel,
        )
        return sorted(
            (r.query_id, r.neighbor_id, round(r.cos_sim, 9))
            for r in out.collect()
        )

    blocked, hof = run("blocked"), run("hof")
    assert blocked == hof
    assert len(blocked) > 0
    assert all(n not in (901, 902, 903) for _, n, _ in blocked)


def test_blocked_kernel_string_ids(spark, tmp_path):
    """ADVICE r10: the kernel used to hard-cast ids to int64; string id
    columns are now first-class (schema follows the input types)."""
    from stock_ops_spark.operators.similarity import knn_join_blocked

    rows = [(f"doc-{i}", lab, v) for (i, v), lab in zip(
        _vectors(60), ["a", "b", "c"] * 20
    )]
    corpus = spark.createDataFrame(
        rows, f"vec_id string, label string, embedding array<float>"
    )
    queries = corpus.limit(6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "label",
    )
    out = knn_join_blocked(
        corpus, queries, k=2, cluster_col="label", id_col="vec_id"
    )
    got = out.collect()
    assert len(got) > 0
    assert all(isinstance(r.query_id, str) and isinstance(r.neighbor_id, str)
               for r in got)
    assert all(r.query_id != r.neighbor_id for r in got)


def test_blocked_kernel_rejects_exotic_id_types(spark, tmp_path):
    """Plan-time validation (ADVICE r10): a double id column raises a
    clear TypeError instead of silently truncating through int64."""
    rows = _vectors(40)
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx = IVF.ivf_index_cached(
        e, src, k_cells=2, iters=1, dim=DIM, cache_dir=cache
    )
    bad = e.select(
        (F.col("vec_id") + 0.5).alias("vec_id"), "embedding"
    )
    queries = e.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    with pytest.raises(TypeError, match="kernel='hof'"):
        IVF.knn_join_from_index(
            bad, idx["centroids"], idx["assign"], queries,
            k=1, nprobe=1, kernel="blocked",
        )


def test_kernel_auto_guard_falls_back_to_hof(spark, tmp_path, monkeypatch):
    """ADVICE r10: kernel='auto' (the new default) driver-collects the
    routed set only when |queries| x nprobe <= max_routed; past the
    bound it must take the distributed HOF path — existing callers
    with unbounded query streams never silently inherit the
    driver-bounded kernel."""
    rows = _vectors(80)
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx = IVF.ivf_index_cached(
        e, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    queries = e.where(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )

    def boom(*a, **kw):
        raise AssertionError("blocked kernel must not be chosen")

    monkeypatch.setattr(IVF, "_blocked_cell_scores", boom)
    # routed = |q| * nprobe > max_routed=1 -> hof, runs fine
    out = IVF.knn_join_from_index(
        e, idx["centroids"], idx["assign"], queries,
        k=2, nprobe=2, kernel="auto", max_routed=1,
    )
    assert out.count() > 0
    # generous bound -> auto picks blocked (the monkeypatched boom)
    with pytest.raises(AssertionError, match="must not be chosen"):
        IVF.knn_join_from_index(
            e, idx["centroids"], idx["assign"], queries,
            k=2, nprobe=2, kernel="auto", max_routed=10**9,
        ).count()


def test_blocked_broadcast_cache_is_bounded(spark, tmp_path):
    """ADVICE r10: repeated kernel calls must not accumulate live
    broadcasts without bound — the module keeps a bounded deque and
    unpersists evictees."""
    rows = _vectors(40)
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx = IVF.ivf_index_cached(
        e, src, k_cells=2, iters=1, dim=DIM, cache_dir=cache
    )
    queries = e.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    for _ in range(IVF._MAX_LIVE_BROADCASTS + 3):
        IVF.knn_join_from_index(
            e, idx["centroids"], idx["assign"], queries,
            k=1, nprobe=1, kernel="blocked",
        ).count()
    assert len(IVF._LIVE_BROADCASTS) <= IVF._MAX_LIVE_BROADCASTS


def test_exact_topk_cached_matches_inline_curve(spark, tmp_path):
    """VERDICT r11 #1: the persisted ground-truth top-k must be
    row-identical to the truth ivf_recall_curve computes inline, and a
    curve served from it must equal the inline curve exactly —
    including under a duplicate-vector tie at the k boundary."""
    from stock_ops_spark.operators.similarity import (
        exact_topk_cached,
        ivf_recall_curve,
    )

    rows = _vectors(160)
    rows[57] = (57, list(rows[23][1]))  # tie at the boundary
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    idx = IVF.ivf_index_cached(
        e, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache
    )
    tagged = e.join(
        idx["assign"].select(F.col("vec_id"), "cid"), "vec_id"
    )
    queries = e.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    stats: dict = {}
    truth = exact_topk_cached(
        e, queries, k=5, source_path=src, cache_dir=cache, stats=stats
    )
    assert stats["truth_cold_build"] is True

    inline = ivf_recall_curve(
        tagged, queries, k=5, nprobes=(1, 2), cluster_col="cid"
    )
    served = ivf_recall_curve(
        tagged, queries, k=5, nprobes=(1, 2), cluster_col="cid",
        truth=truth,
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, served.collect())
    )
    # the artifact rows ARE the inline truth set: recall at
    # nprobe=all-cells must be exactly 1.0 against the cached truth
    full = ivf_recall_curve(
        tagged, queries, k=5, nprobes=(4,), cluster_col="cid",
        truth=truth,
    ).collect()[0]
    assert float(full.recall_at_k) == 1.0

    # warm second call: no recompute
    stats2: dict = {}
    exact_topk_cached(
        e, queries, k=5, source_path=src, cache_dir=cache, stats=stats2
    )
    assert stats2["truth_cold_build"] is False


def test_exact_topk_cached_invalidates_on_corpus_and_query_change(
    spark, tmp_path
):
    """A corpus append (new source identity) or a different query
    sample must cold-build a NEW truth; the stale artifact is never
    served."""
    from stock_ops_spark.operators.similarity import exact_topk_cached

    rows = _vectors(80)
    src = str(tmp_path / "emb.parquet")
    e = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    queries = e.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    s1: dict = {}
    t1 = exact_topk_cached(
        e, queries, k=3, source_path=src, cache_dir=cache, stats=s1
    )
    n1 = t1.count()
    assert s1["truth_cold_build"] is True

    # corpus append -> new version -> recompute, truth reflects the
    # appended rows
    rows2 = rows + _vectors(40, seed=17)[-40:]
    rows2 = rows + [(500 + i, v) for i, (_, v) in enumerate(_vectors(40, seed=17))]
    e2 = _write(spark, rows2, src)
    q2 = e2.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    s2: dict = {}
    t2 = exact_topk_cached(
        e2, q2, k=3, source_path=src, cache_dir=cache, stats=s2
    )
    assert s2["truth_cold_build"] is True
    assert t2.count() >= n1

    # same corpus, different query sample -> also a cold build
    q3 = e2.where(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    s3: dict = {}
    exact_topk_cached(
        e2, q3, k=3, source_path=src, cache_dir=cache, stats=s3
    )
    assert s3["truth_cold_build"] is True

    # unchanged pair -> warm
    s4: dict = {}
    exact_topk_cached(
        e2, q2, k=3, source_path=src, cache_dir=cache, stats=s4
    )
    assert s4["truth_cold_build"] is False


def test_refresh_loop_reuses_truth_across_generations(spark, tmp_path):
    """The ground truth is quantizer-independent: ivf_index_with_refresh
    must measure the pre- AND post-refresh curves from ONE truth
    artifact (one cold build per corpus version), and the refresh
    decision itself must be unchanged by the caching."""
    from stock_ops_spark.operators.similarity import exact_topk_cached

    rows = _vectors(120)
    src = str(tmp_path / "emb.parquet")
    v1 = _write(spark, rows, src)
    cache = str(tmp_path / "cache")
    IVF.ivf_index_cached(v1, src, k_cells=4, iters=2, dim=DIM, cache_dir=cache)
    rng = random.Random(11)
    rows2 = rows + [
        (500 + i, [round(5.0 + rng.uniform(-0.3, 0.3), 4) for _ in range(DIM)])
        for i in range(360)
    ]
    v2 = _write(spark, rows2, src)
    queries = v2.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    stats: dict = {}
    IVF.ivf_index_with_refresh(
        v2, src, queries, k_cells=4, iters=2, dim=DIM,
        target_recall=0.999, k=5, cache_dir=cache, stats=stats,
    )
    assert stats["refreshed"] is True  # the drift still forces refresh
    # the post-refresh measurement hit the SAME artifact: a direct call
    # for this (corpus version, queries, k) is warm
    s2: dict = {}
    exact_topk_cached(
        v2, queries, k=5, source_path=src, cache_dir=cache, stats=s2
    )
    assert s2["truth_cold_build"] is False
