"""Delta-vs-rebuild cost for the incremental artifacts (span grams, IVF
index) at an arbitrary SF dir — the measurement behind the SCALING.md
adjudication that a corpus append refreshes in O(delta), not O(corpus).

    python tools/bench_artifact_delta.py [SF_DIR] [--frac 0.05]

For each artifact family: build v0 cold on the base corpus, append
``frac`` synthetic rows to make v1, time (a) the incremental refresh
from v0's state and (b) a from-scratch rebuild of v1 in a fresh cache.
Work counters (docs tokenized / vectors assigned) bound the claim
independently of wall clock — local job floors can mask the gap that
dominates at 100 TB.

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    frac = 0.05
    if "--frac" in sys.argv:
        frac = float(sys.argv[sys.argv.index("--frac") + 1])

    from pyspark.sql import functions as F

    from stock_ops_spark.operators import ivf as IVF
    from stock_ops_spark.operators import spans as SP
    from stock_ops_spark.session import get_spark

    spark = get_spark(
        "bench-artifact-delta",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    out: dict = {"sf_dir": sf_dir, "frac": frac}
    work = tempfile.mkdtemp(prefix="art_delta_")
    try:
        # ---------------- span-gram artifact over documents ----------
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n_docs = docs.count()
        n_add = max(1, int(n_docs * frac))
        src = os.path.join(work, "docs.parquet")
        docs.write.mode("overwrite").parquet(src)
        v0 = spark.read.parquet(src)
        cache = os.path.join(work, "cache_span")
        t0 = time.perf_counter()
        SP.span_state_cached(v0, src, cache_dir=cache)
        cold_s = time.perf_counter() - t0
        # append frac new docs (fresh ids, recycled text)
        mx = docs.agg(F.max("doc_id")).collect()[0][0]
        add = (
            docs.orderBy("doc_id")
            .limit(n_add)
            .withColumn("doc_id", F.col("doc_id") + F.lit(mx + 1))
        )
        v1_df = docs.unionByName(add)
        v1_df.write.mode("overwrite").parquet(src)
        v1 = spark.read.parquet(src)
        stats: dict = {}
        t0 = time.perf_counter()
        SP.span_state_cached(v1, src, cache_dir=cache, stats=stats)
        delta_s = time.perf_counter() - t0
        cache2 = os.path.join(work, "cache_span_fresh")
        stats2: dict = {}
        t0 = time.perf_counter()
        SP.span_state_cached(v1, src, cache_dir=cache2, stats=stats2)
        rebuild_s = time.perf_counter() - t0
        out["span"] = {
            "n_docs": n_docs + n_add,
            "cold_s": round(cold_s, 2),
            "delta_s": round(delta_s, 2),
            "rebuild_s": round(rebuild_s, 2),
            "delta_docs_tokenized": stats.get("docs_tokenized"),
            "rebuild_docs_tokenized": stats2.get("docs_tokenized"),
        }
        # ---------------- IVF index over embeddings -------------------
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n_vec = emb.count()
        n_addv = max(1, int(n_vec * frac))
        esrc = os.path.join(work, "emb.parquet")
        emb.write.mode("overwrite").parquet(esrc)
        e0 = spark.read.parquet(esrc)
        ecache = os.path.join(work, "cache_ivf")
        t0 = time.perf_counter()
        IVF.ivf_index_cached(
            e0, esrc, k_cells=16, iters=3, dim=64, cache_dir=ecache
        )
        ecold_s = time.perf_counter() - t0
        emx = emb.agg(F.max("vec_id")).collect()[0][0]
        eadd = (
            emb.orderBy("vec_id")
            .limit(n_addv)
            .withColumn("vec_id", F.col("vec_id") + F.lit(emx + 1))
        )
        emb.unionByName(eadd).write.mode("overwrite").parquet(esrc)
        e1 = spark.read.parquet(esrc)
        estats: dict = {}
        t0 = time.perf_counter()
        IVF.ivf_index_cached(
            e1, esrc, k_cells=16, iters=3, dim=64, cache_dir=ecache,
            stats=estats,
        )
        edelta_s = time.perf_counter() - t0
        ecache2 = os.path.join(work, "cache_ivf_fresh")
        estats2: dict = {}
        t0 = time.perf_counter()
        IVF.ivf_index_cached(
            e1, esrc, k_cells=16, iters=3, dim=64, cache_dir=ecache2,
            stats=estats2,
        )
        erebuild_s = time.perf_counter() - t0
        out["ivf"] = {
            "n_vectors": n_vec + n_addv,
            "cold_s": round(ecold_s, 2),
            "delta_s": round(edelta_s, 2),
            "rebuild_s": round(erebuild_s, 2),
            "delta_vectors_assigned": estats.get("vectors_assigned"),
            "rebuild_vectors_assigned": estats2.get("vectors_assigned"),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
