"""Embedding clustering — the learned-partition layer under semantic
dedup (SemDeDup, Abbas et al. 2023) and diversity sampling.

``kmeans_fit`` is Lloyd's algorithm expressed Spark-first:

- **assignment is a map-side codegen expression** — the k centroids are
  tiny driver-side lists, so each point's nearest centroid is an
  ``array_min`` over k inline ``struct(distance, cid)`` expressions: no
  join, no shuffle, no Python.  On a 1000-executor cluster this is one
  scan of the corpus per iteration.
- **recompute is one k-row shuffle** — per-dimension sums are separate
  aggregate columns (``sum(embedding[i])``), so partial aggregation
  combines map-side and the exchange carries k rows of dim+2 doubles,
  not an exploded (row × dim) stream.
- **centroids are quantized between iterations** (``F.round`` at 6 dp,
  HALF_UP — the same decimal the oracle's ``round()`` produces) so the
  only order-dependent float arithmetic (the mean) is snapped to a
  decimal grid before it feeds the next assignment; every comparison
  both engines make is over identical doubles.
- empty clusters keep their previous centroid (both engines).

Reference parity: the reference has no clustering operator — this is
part of the training-data-pipeline extension surface (SURVEY §6), the
scale path that makes q36-style within-cluster dedup work when no
ground-truth ``label`` exists.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_ops_spark.operators import artifacts


def _l2sq_to_literal(vec_col: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, accumulated in double,
    dims folded in order (matches the oracle's in-order list_sum)."""
    cvec = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_col, cvec, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``cid`` (nearest centroid, distance then cid tiebreak) and
    ``dist_sq``.  Pure map-side expression — no shuffle, no join."""
    candidates = F.array(
        *[
            F.struct(
                _l2sq_to_literal(F.col(vec_col), c).alias("dist_sq"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(candidates)
    return df.withColumn("_best", best).withColumn(
        "cid", F.col("_best.cid")
    ).withColumn("dist_sq", F.col("_best.dist_sq")).drop("_best")


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[float]]:
    """Lloyd's k-means; returns the final centroids (k × dim doubles).

    Init = the k lowest-``id_col`` vectors (deterministic, matches the
    oracle's ``ORDER BY vec_id LIMIT k``).  Each iteration collects
    exactly k rows (the rounded per-dimension means) to the driver —
    the centroid set is the broadcast state of the algorithm, never the
    data."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[0]] for r in init]
    for _ in range(iters):
        assigned = assign_clusters(df, cents, vec_col=vec_col)
        sums = assigned.groupBy("cid").agg(
            F.count("*").alias("n"),
            *[
                F.round(
                    F.sum(F.get(F.col(vec_col), i).cast("double")) / F.count("*"), 6
                ).alias(f"m{i}")
                for i in range(dim)
            ],
        )
        new = {
            r["cid"]: [r[f"m{i}"] for i in range(dim)] for r in sums.collect()
        }
        cents = [new.get(c, cents[c]) for c in range(k)]
    return cents


def fit_or_load_centroids(
    df: DataFrame,
    source_path: str,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    cache_dir: str | None = None,
) -> list[list[float]]:
    """Persisted twin of ``kmeans_fit``: the fitted centroids are a tiny
    model artifact (k × dim doubles), so fit ONCE per source dataset and
    share the result across every process that composes over the learned
    clustering (q113 medoids, q114 SemDeDup, q121 streaming assignment —
    and, at 100 TB, every downstream job in the pipeline: refitting per
    job would rescan the corpus iters times each).

    Cache key = (source file identity: path+mtime+size, k, iters, dim,
    id/vec col) — a rewritten source invalidates automatically.  Write is
    atomic (tmp + rename) so concurrent fitters race benignly: worst case
    both fit, one file wins, contents identical (the fit is
    deterministic).  ``cache_dir`` defaults to
    ``$SPARK_GRAFT_MODEL_CACHE`` or a uid-scoped tmpdir subdirectory
    (see ``artifacts.default_cache_dir``).
    """
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    ident = artifacts.source_identity(source_path)
    # v-tag: bump when the fit's semantics change — the key must identify
    # the algorithm as well as the inputs, or a code change serves stale fits
    raw = f"v1|{ident}|k={k}|iters={iters}|dim={dim}|{id_col}|{vec_col}"
    key = artifacts.cache_key(raw)
    path = os.path.join(cache_dir, f"kmeans_{key}.json")
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    cents = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        json.dump(cents, fh)
    os.replace(tmp, path)
    return cents


def kmeans_oracle_cte(
    k: int = 8, iters: int = 3, dim: int = 64, fit_source: str = "embeddings"
) -> str:
    """DuckDB CTE chain replaying the identical Lloyd iterations; the
    FIT runs over ``fit_source`` (default the ``embeddings`` view — pass
    a CTE name to freeze the quantizer on a subset, e.g. q331's
    batch-0 bootstrap), while the terminal ``assign`` CTE assigns the
    FULL ``embeddings`` view against the final centroids (vec_id, cid,
    dist_sq).  Shared by every query whose oracle needs the learned
    clustering."""
    parts = [
        f"""c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             list_transform(embedding, x -> x::DOUBLE) AS cvec
      FROM (SELECT * FROM {fit_source} ORDER BY vec_id LIMIT {k})
    )"""
    ]
    mean_cols = ", ".join(
        f"round(avg(e.embedding[{i + 1}]::DOUBLE), 6) AS m{i}" for i in range(dim)
    )
    mean_list = "[" + ", ".join(f"m{i}" for i in range(dim)) + "]"
    for it in range(iters):
        parts.append(
            f"""a{it} AS (
      SELECT vec_id, cid, dist_sq FROM (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(range(1, {dim + 1}),
                 i -> (e.embedding[i]::DOUBLE - c.cvec[i]) * (e.embedding[i]::DOUBLE - c.cvec[i]))) AS dist_sq,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(range(1, {dim + 1}),
                   i -> (e.embedding[i]::DOUBLE - c.cvec[i]) * (e.embedding[i]::DOUBLE - c.cvec[i]))), c.cid) AS rn
        FROM {fit_source} e CROSS JOIN c{it} c
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""c{it + 1} AS (
      SELECT p.cid, coalesce(n.cvec, p.cvec) AS cvec
      FROM c{it} p LEFT JOIN (
        SELECT a.cid, {mean_list} AS cvec FROM (
          SELECT a.cid, {mean_cols}
          FROM a{it} a JOIN {fit_source} e USING (vec_id)
          GROUP BY a.cid
        ) a
      ) n USING (cid)
    )"""
        )
    parts.append(
        f"""assign AS (
      SELECT vec_id, cid, dist_sq FROM (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(range(1, {dim + 1}),
                 i -> (e.embedding[i]::DOUBLE - c.cvec[i]) * (e.embedding[i]::DOUBLE - c.cvec[i]))) AS dist_sq,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(range(1, {dim + 1}),
                   i -> (e.embedding[i]::DOUBLE - c.cvec[i]) * (e.embedding[i]::DOUBLE - c.cvec[i]))), c.cid) AS rn
        FROM embeddings e CROSS JOIN c{iters} c
      ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(parts)
