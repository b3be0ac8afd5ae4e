"""kmeans_fit / assign_clusters — the learned-partition layer.

The oracle sweep (test_queries_oracle) already hash-checks q113/q114
end-to-end; these tests pin the operator-level contracts: assignment is
shuffle-free, Lloyd's iterations monotonically tighten the clustering,
and empty clusters keep their previous centroid.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_ops_spark.operators.clustering import (
    assign_clusters,
    fit_or_load_centroids,
    kmeans_fit,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_assignment_is_map_side(spark, emb):
    cents = kmeans_fit(emb, k=4, iters=1, dim=64)
    plan = assign_clusters(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan+project: no join, no shuffle


def test_lloyd_iterations_tighten(spark, emb):
    def sse(cents):
        return assign_clusters(emb, cents).agg(F.sum("dist_sq")).first()[0]

    c1 = kmeans_fit(emb, k=4, iters=1, dim=64)
    c3 = kmeans_fit(emb, k=4, iters=3, dim=64)
    # Lloyd's is monotone non-increasing in SSE (6-dp quantization can
    # perturb by ~1e-6 per dim; allow that slack)
    assert sse(c3) <= sse(c1) + 1e-3


def test_empty_cluster_keeps_previous_centroid(spark):
    # 4 identical points, k=3: after one iteration every point sits in
    # one cluster; the starved centroids must keep their previous value
    # (not NaN / not dropped) on both engines' replay
    rows = [(i, [float(i == 0), 0.0, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(df, k=3, iters=2, dim=3)
    assert len(cents) == 3
    assert all(len(c) == 3 and all(v == v for v in c) for c in cents)
    a = assign_clusters(df, cents).select("vec_id", "cid").collect()
    assert len(a) == 4


def test_fit_or_load_centroids_persists_one_fit(spark, emb, tmp_path, monkeypatch):
    """Second call (any process) must serve the persisted artifact, not
    refit; a rewritten source file must invalidate the cache."""
    import stock_ops_spark.operators.clustering as C

    src = f"{SF}/embeddings.parquet"
    cache = str(tmp_path / "models")
    first = fit_or_load_centroids(emb, src, k=4, iters=1, dim=64, cache_dir=cache)

    def boom(*a, **kw):
        raise AssertionError("refit attempted despite cached artifact")

    monkeypatch.setattr(C, "kmeans_fit", boom)
    again = fit_or_load_centroids(emb, src, k=4, iters=1, dim=64, cache_dir=cache)
    assert again == first

    # different hyperparams → different key → would need a (blocked) refit
    with pytest.raises(AssertionError, match="refit attempted"):
        fit_or_load_centroids(emb, src, k=5, iters=1, dim=64, cache_dir=cache)


def test_assignment_deterministic_tiebreak(spark):
    # a point equidistant to two centroids goes to the LOWER cid
    df = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    assert assign_clusters(df, cents).first()["cid"] == 0
