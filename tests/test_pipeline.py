"""CorpusPipeline: the declarative curation funnel (pipeline.py).

The funnel SEMANTICS are oracle-verified end-to-end by q260 (DuckDB
replays all five stages in SQL); these tests pin the machinery around
it: Observation-based single-job row accounting agrees with the
per-stage count union, the curated output is exactly the docs the
funnel says survive, and stage composition validates its inputs.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_ops_spark import catalog
from stock_ops_spark.pipeline import (
    CorpusPipeline,
    Stage,
    drop_benchmark,
    exact_dedup,
    near_dedup,
    quality_gates,
    standard_curation,
)

SF = "/root/testdata/sf0.001"


def _pairs_fn(spark):
    from stock_ops_spark.operators.dedup import minhash_near_dup_pairs_cached

    def fn():
        return minhash_near_dup_pairs_cached(
            catalog.load(spark, SF, "documents"),
            source_path=catalog.table_path(SF, "documents"),
            id_col="doc_id",
            text_col="text",
            threshold=0.5,
        )

    return fn


def test_run_observations_match_funnel_counts(spark):
    """run() executes the whole funnel as ONE job (write/collect) and
    every stage's Observation must report exactly the row count the
    per-stage count union (funnel()) computes."""
    docs = catalog.load(spark, SF, "documents").select("doc_id", "text")
    pipe = standard_curation(docs, _pairs_fn(spark))

    expected = {
        r["stage"]: r["rows_out"] for r in pipe.funnel(docs).collect()
    }

    curated, obs = pipe.run(docs)
    survivors = [r["doc_id"] for r in curated.collect()]  # the ONE action
    for name, o in obs.items():
        assert o.get["rows_out"] == expected[name], name
    # the curated frame IS the last stage's survivors
    assert len(survivors) == expected["decontaminate"]
    assert len(set(survivors)) == len(survivors)

    # survivors never include benchmark docs or exact-dup losers
    assert all(i % 23 != 0 for i in survivors)


def test_funnel_is_monotone_and_labeled(spark):
    docs = catalog.load(spark, SF, "documents").select("doc_id", "text")
    pipe = standard_curation(docs, _pairs_fn(spark))
    rows = pipe.funnel(docs).collect()
    assert [r["stage"] for r in rows] == [
        "input",
        "drop_benchmark",
        "quality",
        "exact_dedup",
        "near_dedup",
        "decontaminate",
    ]
    counts = [r["rows_out"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # stages only remove
    assert counts[0] > 0 and counts[-1] > 0


def test_stage_validation():
    with pytest.raises(ValueError):
        CorpusPipeline([])
    s = Stage("x", lambda df: df)
    with pytest.raises(ValueError):
        CorpusPipeline([s, Stage("x", lambda df: df)])


def test_near_dedup_requires_surviving_killer(spark):
    """A pair whose smaller side was already removed upstream must NOT
    kill the larger side (the killer has to be a survivor)."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3)], "id_a long, id_b long"
    )  # killer 1 is NOT in the frame below
    survivors = docs.where(F.col("doc_id") != 1)
    out = near_dedup(lambda: pairs).apply(survivors)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]
    # and with the killer present, 3 dies
    out2 = near_dedup(lambda: pairs).apply(docs)
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 2]


def test_auto_capped_pipeline_pairs_identical(spark):
    """The funnel's default pair supplier (auto-sized hot-bucket cap)
    must produce the IDENTICAL verified pair set as the uncapped build
    on the adversarial shared-vocab corpus — the pipeline-path twin of
    test_lsh_hot_bucket_cap_preserves_pairs."""
    import os

    from stock_ops_spark.operators.dedup import minhash_near_dup_pairs
    from stock_ops_spark.pipeline import auto_near_dup_pairs

    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        "sf0.3",
    )
    if not os.path.isdir(sf_dir):
        from tools.scale_gen import gen

        gen(0.3, sf_dir)
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    auto = {
        (r["id_a"], r["id_b"])
        for r in auto_near_dup_pairs(d)().collect()
    }
    base = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(d, "doc_id", "text").collect()
    }
    assert auto == base and auto


def test_standard_curation_defaults_to_auto_pairs(spark):
    """pairs_fn=None runs end-to-end and agrees with an explicit
    uncapped pairs_fn on the funnel's survivor set."""
    docs = catalog.load(spark, SF, "documents").select("doc_id", "text")
    from stock_ops_spark.operators.dedup import minhash_near_dup_pairs

    default_pipe = standard_curation(docs)
    explicit_pipe = standard_curation(
        docs, lambda: minhash_near_dup_pairs(docs, "doc_id", "text")
    )
    got_default, _ = default_pipe.run(docs)
    got_explicit, _ = explicit_pipe.run(docs)
    a = {r["doc_id"] for r in got_default.collect()}
    b = {r["doc_id"] for r in got_explicit.collect()}
    assert a == b and a
