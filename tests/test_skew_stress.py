"""Skew stress: hot-key corpora through the pair-generation paths.

The scale argument for grid decomposition and LSH banding is precisely
the skewed case — one huge near-dup cluster (a boilerplate page, a
scraped template) concentrating quadratic pair work onto one key.  These
tests pin that the decomposition ENGAGES and stays exact under a corpus
whose hot block is 10% of all rows, within a local wall-clock bound (the
bounds are generous vs typical runtimes — they catch the O(n²)-in-one-
task collapse, which is >10× slower, not scheduler jitter).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stock_ops_spark.operators.dedup import minhash_near_dup_pairs
from stock_ops_spark.operators.similarity import grid_self_pairs

HOT_BOUND_S = 120.0  # generous local bound; quadratic collapse is minutes


def test_grid_self_pairs_hot_block_exact_and_bounded(spark):
    """4000 rows, 400 of them (10%) in ONE block: the hot block's 79,800
    pairs must all be produced exactly once, with the join keyed on
    (block, ga, gb) so no single task owns the full n² square."""
    n, hot = 4000, 400
    rows = spark.range(n).select(
        F.col("id").alias("vec_id"),
        # first `hot` ids share block "h"; the rest are singleton blocks
        F.when(F.col("id") < hot, F.lit("h"))
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("label"),
    )
    t0 = time.perf_counter()
    pairs = grid_self_pairs(rows, ["label"], id_col="vec_id", grid=4)
    got = pairs.count()
    elapsed = time.perf_counter() - t0
    assert got == hot * (hot - 1) // 2  # C(400,2), singletons contribute 0
    assert elapsed < HOT_BOUND_S, f"hot-block pair generation took {elapsed:.1f}s"

    # the decomposition is in the plan: the self-join key carries the grid
    # cell ids, not just the block column
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ga" in plan and "gb" in plan


def test_grid_self_pairs_hot_block_no_duplicate_pairs(spark):
    """Replication (grid× per side) must not double-produce any pair —
    spot-check the hot corpus for duplicates, not just the total count."""
    n, hot = 1000, 100
    rows = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < hot, F.lit("h"))
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("label"),
    )
    pairs = grid_self_pairs(rows, ["label"], id_col="vec_id", grid=4).select(
        F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib")
    )
    assert pairs.count() == pairs.distinct().count() == hot * (hot - 1) // 2


def test_minhash_hot_cluster_bounded(spark):
    """1000 docs, 100 of them (10%) near-identical: every hot-cluster pair
    must verify (the planted edits keep jaccard far above threshold), the
    LSH candidate stage must not explode beyond the hot cluster, and the
    whole pipeline stays inside the wall-clock bound."""
    hot, cold = 100, 900
    base = (
        "the quick brown fox jumps over the lazy dog while the spark "
        "executor shuffles partitions across the cluster ring today"
    )
    docs = [(i, f"{base} variant {i % 7}") for i in range(hot)] + [
        (
            hot + j,
            f"document {j} about topic {j * 37 % 101} with unique content "
            f"{j ** 2} and trailing entropy {j * 7919}",
        )
        for j in range(cold)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(
        df, "doc_id", "text", threshold=0.5, num_hashes=64, bands=16
    )
    rows = pairs.collect()
    elapsed = time.perf_counter() - t0
    assert elapsed < HOT_BOUND_S, f"hot-cluster dedup took {elapsed:.1f}s"

    ids = set(range(hot))
    hot_pairs = {
        (r["id_a"], r["id_b"]) for r in rows if r["id_a"] in ids and r["id_b"] in ids
    }
    # the planted cluster: every pair differs by at most the variant tag →
    # jaccard ≫ 0.5, so all C(100,2) pairs must be found AND verified
    assert len(hot_pairs) == hot * (hot - 1) // 2
    # every emitted pair exactly once, nothing crosses the hot/cold split,
    # and everything clears the exact-verify threshold (the cold template
    # docs legitimately pair with each other — that is corpus, not noise)
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})
    assert not any((r["id_a"] in ids) != (r["id_b"] in ids) for r in rows)
    assert all(r["jaccard"] >= 0.5 for r in rows)
