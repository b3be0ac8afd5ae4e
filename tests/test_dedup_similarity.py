"""Unit tests for the dedup + similarity operator suites on synthetic
data with planted structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_ops_spark.functions.text import fingerprint_md5
from stock_ops_spark.operators.dedup import (
    exact_dup_groups,
    minhash_near_dup_pairs,
    shingle_sets,
)
from stock_ops_spark.operators.multimodal import (
    extract_features,
    media_from_text,
    metadata_only_stats,
)
from stock_ops_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    knn_join,
    simhash_bucketed_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz in the crowded station hall under flickering lights"
)

DOCS = [
    (0, BASE),
    (1, BASE.replace("slow waltz", "fast polka")),  # near-dup of 0
    (2, "completely different text about financial markets and trading"),
    (3, "completely different text about financial markets and trading"),  # exact dup of 2
    (4, "short"),
    (5, "zebra xylophone quartz jackdaw vexing mime " * 4),
]


def test_minhash_finds_planted_neardup(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = minhash_near_dup_pairs(df, "doc_id", "text", threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got  # near-dup recovered
    assert (2, 3) in got  # exact dup has jaccard 1.0
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert jac[(2, 3)] == 1.0
    assert 0.5 <= jac[(0, 1)] < 1.0
    # no false positives among unrelated docs
    assert all(p in {(0, 1), (2, 3)} for p in got)


def test_minhash_pairs_cached_serves_artifact(spark, tmp_path, monkeypatch):
    """Second call must read the materialized pair artifact, not
    recompute the pipeline; different params → different artifact."""
    import stock_ops_spark.operators.dedup as D

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    src = str(tmp_path / "docs.parquet")
    df.write.parquet(src)
    cache = str(tmp_path / "models")
    first = {
        (r.id_a, r.id_b)
        for r in D.minhash_near_dup_pairs_cached(
            df, src, "doc_id", "text", threshold=0.5, cache_dir=cache
        ).collect()
    }
    assert (0, 1) in first and (2, 3) in first

    def boom(*a, **kw):
        raise AssertionError("pipeline recomputed despite cached artifact")

    monkeypatch.setattr(D, "minhash_near_dup_pairs", boom)
    again = {
        (r.id_a, r.id_b)
        for r in D.minhash_near_dup_pairs_cached(
            df, src, "doc_id", "text", threshold=0.5, cache_dir=cache
        ).collect()
    }
    assert again == first
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="recomputed"):
        D.minhash_near_dup_pairs_cached(
            df, src, "doc_id", "text", threshold=0.9, cache_dir=cache
        )


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    groups = exact_dup_groups(df, "doc_id", fingerprint_md5(F.col("text")))
    dups = [r for r in groups.collect() if r.n_docs > 1]
    assert len(dups) == 1 and dups[0].canonical_id == 2


def test_shingle_short_text_fallback(spark):
    df = spark.createDataFrame([(4, "short")], "doc_id long, text string")
    sh = shingle_sets(df, "doc_id", "text").collect()[0]
    assert sh.shingles == ["short"]  # shorter than n → whole text


VECS = [
    # two near-identical vectors (0, 1) and unrelated ones, 8-d padded to 64
    (0, [1.0, 2.0, 3.0, 4.0] * 16, 0),
    (1, [1.0, 2.0, 3.0, 4.01] * 16, 0),
    (2, [-1.0, 5.0, -3.0, 0.5] * 16, 1),
    (3, [0.1, -2.0, 7.0, -1.0] * 16, 1),
    (4, [4.0, 3.0, 2.0, 1.0] * 16, 2),
]


def _vec_df(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>, label int"
    )


def test_brute_force_and_knn(spark):
    e = _vec_df(spark)
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    top = brute_force_topk(e.where(F.col("vec_id") != 0), qv, k=2).collect()
    assert top[0].vec_id == 1 and top[0].cos_sim > 0.999

    q = e.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nn = {r.query_id: r.neighbor_id for r in knn_join(e, q, k=1).collect()}
    assert nn == {0: 1, 1: 0}


def test_ivf_matches_brute_force_on_probed_cells(spark):
    e = _vec_df(spark)
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    corpus = e.where(F.col("vec_id") != 0)
    ivf = ivf_topk(corpus, qv, k=1, nprobe=3)  # nprobe=all labels → exact
    bf = brute_force_topk(corpus, qv, k=1)
    assert ivf.collect()[0].vec_id == bf.collect()[0].vec_id == 1


def test_simhash_bucketed_pairs_finds_twin(spark):
    e = _vec_df(spark)
    pairs = simhash_bucketed_pairs(e, max_hamming=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert (0, 1) in got and got[(0, 1)] == 0  # identical signs → hamming 0


def test_multimodal_feature_extraction(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    media = media_from_text(df, "doc_id", "text", "image")
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == len(DOCS)
    by_id = {r.media_id: r for r in feats}
    assert by_id[4].n_bytes == 5  # "short"
    assert len(by_id[0].feature) == 8
    assert all(0.0 <= v <= 1.0 for v in by_id[0].feature)
    # deterministic: exact dup texts → identical features
    assert by_id[2].feature == by_id[3].feature

    stats = {r.modality: r for r in metadata_only_stats(media).collect()}
    assert stats["image"].n_items == len(DOCS)


def test_multimodal_strict_raises(spark):
    import pytest

    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    media = media_from_text(df, "doc_id", "text", "audio")
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        extract_features(media, strict=True).collect()


def test_text_simhash_neardup(spark):
    from stock_ops_spark.operators.dedup import (
        text_simhash64,
        text_simhash_candidates,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sk = {r.id: r.sk for r in text_simhash64(df, "doc_id", "text").collect()}
    # identical texts → identical sketches
    assert sk[2] == sk[3]
    # near-dup (2-token change) → small hamming; unrelated → large
    ham = lambda a, b: bin((sk[a] ^ sk[b]) & ((1 << 64) - 1)).count("1")
    assert ham(0, 1) <= 12
    assert ham(0, 5) > 12

    # banded blocking guarantees recall only for hamming < bands (4):
    # the exact dup (hamming 0) must be found; the ~10-bit-flip near-dup
    # may legitimately miss every 16-bit band (short docs flip many bits —
    # simhash blocking is a long-document technique; minhash covers short)
    cands = text_simhash_candidates(df, "doc_id", "text", max_hamming=12)
    got = {(r.id_a, r.id_b): r.hamming for r in cands.collect()}
    assert got[(2, 3)] == 0
    assert all(h <= 12 for h in got.values())


def test_multimodal_frame_sampling(spark):
    """1→N expansion through mapInPandas: per-video frame rows with
    timing metadata and per-frame features; strict mode marks the codec
    boundary."""
    from stock_ops_spark.operators.multimodal import (
        FRAME_SCHEMA,
        media_from_text,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 5000), (2, "y" * 1500), (3, "z" * 10)],
        "doc_id long, text string",
    )
    media = media_from_text(docs, "doc_id", "text", "video")
    frames = sample_frames(media, every_ms=1000, max_frames=8)
    assert frames.schema == FRAME_SCHEMA
    rows = frames.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    # 5000 bytes @ 1000 ms → 5 frames; 1500 → 1; tiny payload → 1 frame
    assert {m: len(v) for m, v in by_media.items()} == {1: 5, 2: 1, 3: 1}
    for r in rows:
        assert r.feature is not None and len(r.feature) == 8
        assert r.frame_bytes is not None and len(r.frame_bytes) > 0
    # frame indices dense from 0, frame_ms monotone
    for m, v in by_media.items():
        v.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in v] == list(range(len(v)))
        assert all(a.frame_ms < b.frame_ms for a, b in zip(v, v[1:]))

    import pytest as _pytest

    with _pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        sample_frames(media, strict=True).collect()


def test_knn_join_ivf_matches_exact_on_probed_cells(spark):
    """Cluster-blocked kNN join: same answers as the exact broadcast join
    whenever the true neighbor lives in a probed cell, and the plan never
    broadcasts the query side whole."""
    import random

    from stock_ops_spark.operators.similarity import knn_join, knn_join_ivf

    rng = random.Random(7)
    rows = []
    # two well-separated clusters in 8-d
    for i in range(60):
        label = i % 2
        base = [5.0, 0, 0, 0, 0, 0, 0, 0] if label == 0 else [0, 5.0, 0, 0, 0, 0, 0, 0]
        rows.append(
            (i, [v + rng.uniform(-0.5, 0.5) for v in base], label)
        )
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    queries = corpus.where("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(corpus, queries, k=2).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_join_ivf(corpus, queries, k=2, nprobe=1).collect()
    }
    # clusters are separated: nprobe=1 already finds the exact neighbors
    assert approx == exact

    plan = knn_join_ivf(corpus, queries, k=2, nprobe=1)._jdf.queryExecution().toString()
    # centroids broadcast; query side meets corpus via equi-join, and the
    # final neighbor search joins on the cluster column
    assert "label" in plan


def test_lsh_hot_bucket_cap_preserves_pairs(spark):
    """max_bucket drops boilerplate-hot buckets before the pair join;
    on the adversarial shared-vocab corpus the verified pair set must
    be IDENTICAL to the uncapped run (band redundancy: a true near-dup
    collides in ~16 bands, a dropped hot bucket removes one)."""
    import os

    from stock_ops_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_sets,
    )

    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        "sf0.3",
    )
    if not os.path.isdir(sf_dir):
        from tools.scale_gen import gen

        gen(0.3, sf_dir)
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sh = shingle_sets(d, "doc_id", "text", 8).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, 64).localCheckpoint(eager=True)
    base = lsh_candidate_pairs(sigs, 64, 16)
    capped = lsh_candidate_pairs(sigs, 64, 16, max_bucket=64)
    assert capped.count() < base.count()  # the cap actually bites
    p0 = {(r[0], r[1]) for r in jaccard_verify(base, sh, 0.5).collect()}
    p1 = {(r[0], r[1]) for r in jaccard_verify(capped, sh, 0.5).collect()}
    assert p0 == p1 and p0  # identical non-empty verified pairs


def test_lsh_bands_prediction_matches_measured_recall(spark):
    """sizing.lsh_bands' S-curve prediction validated against a MEASURED
    run: exact Jaccard >= t ground-truth pairs on the sf0.01 corpus vs
    banded-LSH candidate sets across configurations.  Pins (a) measured
    recall >= prediction minus a small sampling tolerance at every
    config, and (b) recall monotone in band count (smaller r can only
    add candidate collisions)."""
    from pyspark.sql import functions as F

    from stock_ops_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_sets,
    )
    from stock_ops_spark.plans.sizing import lsh_bands

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sh = shingle_sets(docs, "doc_id", "text").localCheckpoint(eager=True)
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sb"))
    t = 0.8
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .where(
            F.size(F.array_intersect("sa", "sb"))
            / F.size(F.array_union("sa", "sb"))
            >= t
        )
        .select("id_a", "id_b")
        .collect()
    }
    assert truth, "corpus should contain planted near-dup pairs"
    sigs = minhash_signatures(sh).localCheckpoint(eager=True)
    measured = []
    for bands in (8, 16, 32):
        r = 64 // bands
        predicted = 1.0 - (1.0 - t**r) ** bands
        cand = {
            (row["id_a"], row["id_b"])
            for row in lsh_candidate_pairs(sigs, 64, bands).collect()
        }
        recall = len(truth & cand) / len(truth)
        measured.append(recall)
        assert recall >= predicted - 0.1, (bands, recall, predicted)
    assert measured == sorted(measured)  # monotone in bands
    # and the sizing rule's own pick meets its promised recall here
    bsz, _r, pred = lsh_bands(t, 0.95, 64)
    cand = {
        (row["id_a"], row["id_b"])
        for row in lsh_candidate_pairs(sigs, 64, bsz).collect()
    }
    assert len(truth & cand) / len(truth) >= min(pred, 0.95) - 0.1


def test_ivf_recall_curve_masks_zero_norm_vectors(spark):
    """r9 advice: a zero-norm corpus or query vector must emit NO
    candidate in the recall kernel (Catalyst cosine yields NULL there,
    which sorts last) — previously acc/0 produced inf/NaN, which numpy
    data would rank ABOVE every real similarity."""
    from stock_ops_spark.operators.similarity import ivf_recall_curve

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 0.0], 0),  # zero-norm corpus vector in the same cell
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    queries = corpus.where("vec_id in (0, 3)").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = {
        r["nprobe"]: r.asDict()
        for r in ivf_recall_curve(
            corpus, queries, k=1, nprobes=(1, 2)
        ).collect()
    }
    # with the zero vector masked, truth@1 for query 0 is vec 1 and for
    # query 3 is vec 4 — both in their own cell, so recall is 1.0 even
    # at nprobe=1, and nothing is NaN/inf
    for nprobe, row in out.items():
        assert row["n_queries"] == 2
        assert row["n_truth"] == 2
        assert row["recall_at_k"] == 1.0

    # a zero-norm QUERY likewise contributes no truth rows at all
    zq = spark.createDataFrame(
        [(99, [0.0, 0.0])], "query_id long, qv array<double>"
    )
    zout = ivf_recall_curve(corpus, zq, k=1, nprobes=(1,)).collect()
    assert all(r["n_truth"] == 0 for r in zout)
