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

# 3. **Unpartitioned windows** (VERDICT r5 #3) — a Window with no
#    PARTITION BY drags its whole input through ONE task, so it is only
#    admissible over a frame whose row count is BOUNDED (by an aggregate
#    key's domain, a top-k, or a calendar span), never over a frame that
#    grows with the fact tables.  The audit walks each plan: every
#    empty-partition-spec Window/WindowGroupLimit must sit (through
#    benign single-child operators) above an aggregate or an explicitly
#    bounded node; anything else needs a CONSCIOUS allowlist entry whose
#    value documents the row bound.
GLOBAL_WINDOW_ALLOWED = {
    # bars = (per-day agg) ⋈ (rn=1-per-day closes) on d: both sides are
    # <= 1 row per calendar day, so the lag/ATR windows see <= #days
    # (~2400 over the fixture span) — a calendar bound, not a data
    # bound.  The probe flags it because the closes side bottoms out in
    # a scan (the rn=1 filter that bounds it is invisible to the
    # structural walk).
    "q188_atr_daily": "<= 1 row per day per join side; window input <= #days",
}

_BENIGN_SINGLE_CHILD = {
    "ProjectExec", "FilterExec", "SortExec", "CoalesceExec",
    "ShuffleExchangeExec", "WindowExec", "WindowGroupLimitExec",
    "ColumnarToRowExec", "InputAdapter", "WholeStageCodegenExec",
    "ReusedExchangeExec", "ExpandExec", "GenerateExec",
}
_AGG = {
    "HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec",
    "AggregateInPandasExec",
}
_BOUNDED = {
    "TakeOrderedAndProjectExec", "GlobalLimitExec", "LocalLimitExec",
    "RangeExec", "LocalTableScanExec", "BroadcastExchangeExec",
}


def _window_bases(node):
    """Classify what a global window's input bottoms out in."""
    cls = node.getClass().getSimpleName()
    if cls in _AGG:
        return ["agg"]
    if cls in _BOUNDED:
        return ["bounded"]
    ch = node.children()
    if cls in _BENIGN_SINGLE_CHILD and ch.size() == 1:
        return _window_bases(ch.apply(0))
    if "Join" in cls or cls == "UnionExec":
        out = []
        for i in range(ch.size()):
            out += _window_bases(ch.apply(i))
        return out
    return [f"FAIL:{cls}"]


def _audit_global_windows(plan):
    """Return the failure bases of every unpartitioned window in the
    plan ([] = clean)."""
    cls = plan.getClass().getSimpleName()
    root = plan.inputPlan() if cls == "AdaptiveSparkPlanExec" else plan
    failures = []

    def walk(n):
        c = n.getClass().getSimpleName()
        if c in ("WindowExec", "WindowGroupLimitExec"):
            if n.partitionSpec().isEmpty():
                bases = _window_bases(n.children().apply(0))
                failures.extend(b for b in bases if b.startswith("FAIL:"))
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(root)
    return failures


@pytest.fixture(scope="module")
def plans(spark):
    """(plan string, global-window audit result) per batch query — one
    plan build shared by every audit in this module."""
    out = {}
    for name, fn in sorted(QUERIES.items()):
        if name in STREAMING:
            continue
        p = fn(spark, SF)._jdf.queryExecution().executedPlan()
        out[name] = (p.toString(), _audit_global_windows(p))
    return {n: s for n, (s, _) in out.items()}, {
        n: a for n, (_, a) in out.items()
    }


def test_no_cartesian_product_anywhere(plans):
    strings, _ = plans
    offenders = [n for n, p in strings.items() if "CartesianProduct" in p]
    assert not offenders, f"unbounded all-pairs products: {offenders}"


def test_row_at_a_time_python_only_in_declared_udtf(plans):
    strings, _ = plans
    offenders = [
        n
        for n, p in strings.items()
        if "BatchEvalPython" in p and n not in ROW_PYTHON_ALLOWED
    ]
    assert not offenders, f"row-at-a-time Python in hot path: {offenders}"


def test_global_windows_only_over_bounded_frames(plans):
    """Every unpartitioned Window must sit above an aggregate/top-k (a
    frame bounded by key domain, not data volume) or carry a documented
    allowlist bound — the 'tiny-frame discipline' as a machine gate."""
    _, audits = plans
    offenders = {
        n: fails
        for n, fails in audits.items()
        if fails and n not in GLOBAL_WINDOW_ALLOWED
    }
    assert not offenders, (
        f"unpartitioned windows over unbounded frames: {offenders} — "
        "either re-shape (partitioned window / chunked prefix / broadcast"
        " thresholds) or add a GLOBAL_WINDOW_ALLOWED entry documenting"
        " the row bound"
    )


def test_global_window_allowlist_not_stale(plans):
    """An allowlist entry whose query now audits clean must be removed —
    stale exemptions rot the gate."""
    _, audits = plans
    stale = [
        n for n in GLOBAL_WINDOW_ALLOWED
        if n in audits and not audits[n]
    ]
    assert not stale, f"allowlist entries no longer needed: {stale}"
