"""Persisted IVF index — (centroids, cell assignments) as an
incremental artifact.

``fit_or_load_centroids`` (operators/clustering.py) already persists
the k-means fit, but every IVF consumer still recomputed CELL
ASSIGNMENTS per query — at 100 TB the assignment pass (a full corpus
scan against k literal centroids) is the dominant cost of serving, and
it is exactly the part an append-only corpus can do incrementally:
assign only the new vectors, retract the removed ones, keep everything
else (VERDICT r8 #2).

State = the two tables every IVF index keeps:

- ``centroids`` (cid, centroid array<double>) — the coarse quantizer.
  FROZEN across appends (the standard IVF discipline: FAISS/ScaNN
  re-train the quantizer offline, not per append).  A frozen quantizer
  drifts as the corpus distribution moves — that is a MEASURED
  quantity here, not a hope: re-run ``ivf_recall_curve`` over the
  artifact's assignment after appends and re-feed
  ``plans/sizing.ivf_nprobe`` (tests pin the loop; SCALE_CURVES
  records append-assign cost tracking the delta).
- ``assign`` (vec_id, cid, fp) — nearest-centroid cell per vector plus
  an md5 fingerprint of the vector (the change detector, same
  discipline as the lexical ``dl`` and span ``docstats`` tables).

Assignment semantics match ``clustering.assign_clusters`` exactly
(squared-L2 to 6dp-quantized centroids, distance-then-cid tiebreak), so
artifact-served IVF is bit-identical to the inline q113/q121 pipelines
and DuckDB's kmeans CTE replay (the q321 oracle pins it end-to-end).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_ops_spark.functions.vector import cosine
from stock_ops_spark.operators.clustering import assign_clusters


def _fp(vec_col: str) -> F.Column:
    """Deterministic md5 fingerprint of an embedding (float-to-string is
    locale-free in Spark; the same vector always maps to the same fp)."""
    return F.md5(
        F.concat_ws(
            ",", F.transform(F.col(vec_col), lambda x: x.cast("string"))
        )
    )


def assign_table(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cid, fp) for every vector — one map-side codegen pass
    (the centroids are literals; no join, no shuffle)."""
    return assign_clusters(df, centroids, vec_col=vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("cid").cast("int").alias("cid"),
        _fp(vec_col).alias("fp"),
    )


def _load_centroid_rows(cent_df: DataFrame) -> list[list[float]]:
    """Collect the (tiny, k x dim) centroid table back to driver lists
    for literal-expression assignment.  Bounded by contract: k <= 256."""
    rows = cent_df.orderBy("cid").collect()
    return [list(r.centroid) for r in rows]


def ivf_index_cached(
    df: DataFrame,
    source_path: str,
    k_cells: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    cache_dir: str | None = None,
    stats: dict | None = None,
) -> dict[str, DataFrame]:
    """Persisted IVF index with incremental append assignment — the
    versioned-family discipline of ``lexical_stats_cached`` /
    ``span_state_cached``: family digest = source abspath + params +
    v-tag (stable across rewrites), version digest = source mtime+size.

    Cold start: Lloyd's fit (deterministic: first-k init, 6dp centroid
    quantization) + full assignment.  Version miss with a complete
    prior version: centroids CARRY FROZEN from the prior fit; only
    (new ∪ changed) vectors are assigned against them and removed
    vectors retract — one bounded pass over the delta, never the
    corpus.  Returns {"centroids", "assign"} reading the published
    artifacts."""
    from stock_ops_spark.operators import artifacts

    spark = df.sparkSession
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    famraw = (
        f"v1|{os.path.abspath(source_path)}|k={k_cells}|iters={iters}"
        f"|dim={dim}|{id_col}|{vec_col}"
    )
    fam = artifacts.cache_key(famraw)
    ver = artifacts.cache_key(artifacts.source_identity(source_path))
    suffixes = [".centroids.parquet", ".assign.parquet"]
    paths = {
        s.split(".")[1]: artifacts.versioned_path(
            cache_dir, "ivf", fam, ver, s
        )
        for s in suffixes
    }
    if all(os.path.isdir(p) for p in paths.values()):
        return {k: spark.read.parquet(p) for k, p in paths.items()}
    os.makedirs(cache_dir, exist_ok=True)
    prior = artifacts.find_prior_version(cache_dir, "ivf", fam, ver, suffixes)
    if prior is not None:
        old_cent = spark.read.parquet(
            artifacts.versioned_path(
                cache_dir, "ivf", fam, prior, ".centroids.parquet"
            )
        )
        old_assign = spark.read.parquet(
            artifacts.versioned_path(
                cache_dir, "ivf", fam, prior, ".assign.parquet"
            )
        )
        cents = _load_centroid_rows(old_cent)
        fps = df.select(
            F.col(id_col).alias("vec_id"), _fp(vec_col).alias("fp")
        ).localCheckpoint(eager=True)
        fresh_ids = fps.join(
            old_assign.select("vec_id", "fp"), ["vec_id", "fp"], "left_anti"
        )
        fresh = df.join(
            fresh_ids.select(F.col("vec_id").alias(id_col)),
            id_col,
            "left_semi",
        ).localCheckpoint(eager=True)
        if stats is not None:
            stats["vectors_assigned"] = fresh.count()
        add = assign_table(fresh, cents, id_col, vec_col)
        kept = old_assign.join(fps, ["vec_id", "fp"], "left_semi")
        assign = kept.unionByName(add)
        cent_df = old_cent
    else:
        from stock_ops_spark.operators.clustering import fit_or_load_centroids

        # share the fit with q113/q114/q121's kmeans model artifact —
        # one Lloyd's pass per (source version, params) across all
        # consumers; the IVF family only adds the assignment table
        cents = fit_or_load_centroids(
            df, source_path=source_path, k=k_cells, iters=iters,
            id_col=id_col, vec_col=vec_col, dim=dim, cache_dir=cache_dir,
        )
        assign = assign_table(df, cents, id_col, vec_col)
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "cid int, centroid array<double>",
        )
        if stats is not None:
            stats["vectors_assigned"] = assign.count()
    artifacts.publish(cent_df, paths["centroids"])
    artifacts.publish(assign, paths["assign"])
    return {k: spark.read.parquet(p) for k, p in paths.items()}


def ivf_topk_from_index(
    corpus: DataFrame,
    centroids: DataFrame,
    assign: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k for ONE query vector SERVED from the persisted index:
    probe the nprobe centroid-nearest cells (centroid table is tiny →
    broadcast both ways), restrict the corpus to probed cells through
    the assignment table BEFORE any distance math, exact cosine only
    inside.  With a cell-partitioned corpus layout the semi-join is
    partition pruning at the scan.  Returns (vec_id, cid, cos_sim)."""
    probed = (
        centroids.join(F.broadcast(query_vec))
        .select(
            "cid", cosine(F.col("centroid"), F.col("qv")).alias("csim")
        )
        .orderBy(F.col("csim").desc_nulls_last(), F.col("cid"))
        .limit(nprobe)
        .select("cid")
    )
    cand = assign.join(F.broadcast(probed), "cid").select(
        F.col("vec_id").alias(id_col), "cid"
    )
    narrowed = corpus.join(cand, id_col)
    sim = cosine(F.col(vec_col), F.col("qv"))
    return (
        narrowed.join(F.broadcast(query_vec))
        .select(id_col, "cid", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc_nulls_last(), F.col(id_col))
        .limit(k)
    )


def knn_join_from_index(
    corpus: DataFrame,
    centroids: DataFrame,
    assign: DataFrame,
    queries: DataFrame,
    k: int = 1,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Approximate k-NN JOIN served from the persisted index — the
    ``knn_join_ivf`` shape with the artifact's frozen cells instead of
    per-run ``centroids_by``: queries route to nprobe nearest centroids
    (broadcast), meet corpus rows through an equi-join on cid, and
    neither side is broadcast whole."""
    qsim = cosine(F.col("centroid"), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        qsim.desc_nulls_last(), F.col("cid")
    )
    routed = (
        queries.join(F.broadcast(centroids))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= nprobe)
        .select(query_id_col, query_vec_col, "cid")
    )
    tagged = corpus.join(
        assign.select(F.col("vec_id").alias(id_col), "cid"), id_col
    )
    sim = cosine(F.col(vec_col), F.col(query_vec_col))
    scored = (
        tagged.join(routed, "cid")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
