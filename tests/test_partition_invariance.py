"""Partition-count invariance: a query's RESULT must not depend on how
the engine happened to partition the data.

The DuckDB oracle gate catches cross-ENGINE divergence, but both engines
run single-layout in that comparison — it cannot catch a result that
changes when Spark's own parallelism changes (the classic culprits:
float sums whose order follows partitioning, first()/head-style picks,
rank ties broken by arrival order, hash-partitioned UDF state).  This
suite re-executes a representative slice of the registry under 2, 8 and
31 shuffle partitions (31 deliberately coprime to every block size used
by the operators) and asserts the order-insensitive value hash is
byte-identical — the same canonicalization the driver's gate uses.

The slice is chosen adversarially, not randomly: every query here
aggregates floats, breaks rank ties, packs by running sums, or carries
multi-stage integer rationals — the shapes partitioning-sensitivity
actually hides in.
"""

from __future__ import annotations

import hashlib

import pytest

from stock_ops_spark import queries as Q

SF = "/root/testdata/sf0.001"

# float-sum, tie-break, running-sum and rational-ranking shapes
SENSITIVE = [
    "q01_pricing_summary",        # float aggregates rounded at 4/6dp
    "q74_tfidf_top_terms",        # integer-rational rank + term ties
    "q207_hourly_mix_entropy",    # fixed-order float term sums
    "q257_source_unigram_kl",     # open-vocab fixed-order sums
    "q278_bm25_topk",             # integer-rational retrieval ranking
    "q279_token_shard_packing",   # running sum → shard assignment
    "q280_embedding_dim_correlation",  # 128-bit rational ranking
    "q281_price_gap_interpolation",    # windowed gap-fill + checksum
    "q283_min_cost_supplier",     # two-level ranking with ties
    "q288_important_parts",       # percentile-threshold membership
    "q298_temperature_sampling_mix",   # fixed-order sqrt normalizer
    "q299_ols_normal_equations",       # decimal moment sums -> Cramer doubles
    "q302_weighted_doc_sample",        # float-clock top-k with tiebreak
    "q303_rrf_hybrid_retrieval",       # two ranked legs fused by RRF
    "q305_ols_residual_diagnostics",   # band moments + broadcast coefficients
    "q310_bm25_artifact_topk",         # artifact-served integer BM25 ranking
    "q311_embedding_decontamination",  # 128-bit integer cosine leaderboard
    "q312_proximity_retrieval",        # positional min-distance ranking
    "q317_ivf_recall_curve",           # double-cosine cell + candidate ranks
    "q318_duplicated_spans",           # window islands over hit positions
]


def _canon_hash(df) -> str:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)

    rows = sorted(
        "\x1f".join(cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for parts in ("2", "8", "31"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            hashes[parts] = _canon_hash(Q.QUERIES[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert len(set(hashes.values())) == 1, (
        f"{name} result depends on shuffle partitioning: {hashes}"
    )
