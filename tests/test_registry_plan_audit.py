"""Registry-wide physical-plan audit: the scale claims as executable
gates, not grep assertions.

Every batch query's executed plan is built once (no jobs beyond the
driver-side fits some operators do anyway) and checked for the two
classic 100 TB killers:

1. **CartesianProduct** — an unbounded all-pairs product.  Zero are
   allowed anywhere; pair-generating operators must block/bucket/grid
   (grid_self_pairs, LSH banding, simhash bands) and day-spine crosses
   must broadcast (BroadcastNestedLoopJoin over a tiny side, a different
   node).
2. **BatchEvalPython** — row-at-a-time Python in the hot path.  Allowed
   only in the declared Python-UDTF demo (q111: lateral chunk explosion
   is the UDTF API itself; every other Python crossing is Arrow-batched:
   ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas / MapInArrow).

New queries that legitimately need an exemption must be added to the
allowlists here CONSCIOUSLY — that is the audit working, not friction.
"""

from __future__ import annotations

import pytest

from stock_ops_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# Streaming demos execute a real stream on build — covered by their own
# tests/oracle rows; excluded here to keep the audit plan-only.
STREAMING = {
    "q45_streaming_bars_demo",
    "q57_windowed_dedup",
    "q69_stream_stream_attribution",
    "q84_trailing_hour_purchases",
    "q95_streaming_dedup",
    "q97_stream_static_enrichment",
    "q102_session_transitions",
    "q121_streaming_cluster_assign",
    "q122_stateful_user_profile",
}

ROW_PYTHON_ALLOWED = {"q111_udtf_chunks"}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in sorted(QUERIES.items()):
        if name in STREAMING:
            continue
        out[name] = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, f"unbounded all-pairs products: {offenders}"


def test_row_at_a_time_python_only_in_declared_udtf(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BatchEvalPython" in p and n not in ROW_PYTHON_ALLOWED
    ]
    assert not offenders, f"row-at-a-time Python in hot path: {offenders}"
