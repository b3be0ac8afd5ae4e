"""Misra–Gries heavy hitters: bounded-state candidate pruning with a
provably exact two-pass top-k.

The 100 TB problem this solves: an exact top-k over an OPEN vocabulary
(tokens, URLs, user agents) first builds the full per-key count table —
Spark's map-side partial aggregation keeps per-task state proportional
to the number of DISTINCT keys seen by that task, which for trillion-
token corpora spills long before it combines.  The Misra–Gries summary
caps per-task state at ``capacity`` counters, FOREVER, at the cost of
undercounting any key by at most N_task/(capacity+1).

Two-pass exactness (the reason this can sit behind a SQL oracle):

1. **Summarize** — one ``mapInPandas`` pass keeps a Misra–Gries summary
   per task; the union of all surviving keys is the candidate set.  A
   key missing from EVERY task summary has true count
   ≤ Σ_task N_task/(capacity+1) = N/(capacity+1)   (the bound).
2. **Recount** — exact counts for candidates only (a semi-join-sized
   aggregation), then keep the top-k.

If the exact k-th candidate count exceeds N/(capacity+1), NO pruned key
can belong to the true top-k, so the result is EXACT — independent of
partitioning, input order, or which ties MG happened to evict.  When
the bound does not hold (near-uniform data, capacity too small), the
result may depend on partition layout, so ``exact_topk_via_mg`` raises
instead of returning a silently partition-dependent answer; callers
either raise ``capacity`` or fall back to the full aggregation.

Reference parity: the reference has no sketching surface at all; this
operator is part of the engine's LLM-pipeline extension (SURVEY.md
north star), alongside HLL++ (q43) and t-digest (q44).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_update(counters: dict, key, inc: int, capacity: int) -> None:
    """Textbook Misra–Gries: increment if tracked or a slot is free,
    else decrement every counter (dropping zeros) — the step that
    charges ``capacity+1`` distinct arrivals for every unit of
    undercount."""
    if key in counters:
        counters[key] += inc
        return
    if len(counters) < capacity:
        counters[key] = inc
        return
    # decrement-all by the largest amount the smallest counter allows,
    # batched so weighted arrivals stay O(capacity log capacity) amortized
    while inc > 0:
        m = min(counters.values())
        step = min(inc, m)
        if step == 0:
            break
        inc -= step
        dead = []
        for k in counters:
            counters[k] -= step
            if counters[k] == 0:
                dead.append(k)
        for k in dead:
            del counters[k]
        if len(counters) < capacity:
            if inc > 0:
                counters[key] = inc
            return
    # inc exhausted by decrements: key not tracked (undercounted), fine


def mg_summaries(
    df: DataFrame, key_col: str, capacity: int, weight_col: str | None = None
) -> DataFrame:
    """One bounded-state pass: per-task Misra–Gries summaries.

    Returns ``(key, est)`` counter rows — ``est`` is the surviving
    counter (an undercount) — plus ONE marker row per task with
    ``key IS NULL`` and ``est`` = the task's total weight, so the
    caller reconstructs the global error bound Σ N_task/(cap+1) from
    the summaries alone, without a second full scan.  NULL input keys
    are excluded (they cannot be a reportable heavy hitter).
    """
    out_schema = f"`{key_col}` string, est long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_seen = 0
        for pdf in batches:
            # Vectorize the Arrow batch into (unique key, total weight)
            # first: a weighted MG arrival is exactly a run of unit
            # arrivals (tests pin the identity), so pre-grouping per
            # batch preserves the guarantee while cutting the Python
            # loop from per-ROW to per-DISTINCT-KEY.
            if weight_col:
                w = pdf[weight_col].astype("int64")
                keep = pdf[key_col].notna() & (w > 0)
                grouped = w[keep].groupby(pdf[key_col][keep]).sum()
            else:
                grouped = pdf[key_col].value_counts(dropna=True)
            for k, wt in grouped.items():
                n_seen += int(wt)
                _mg_update(counters, k, int(wt), capacity)
        if n_seen == 0:
            return
        yield pd.DataFrame(
            {
                key_col: list(counters.keys()) + [None],
                "est": [int(v) for v in counters.values()] + [n_seen],
            }
        )

    return df.select(
        F.col(key_col).cast("string").alias(key_col),
        *([F.col(weight_col)] if weight_col else []),
    ).mapInPandas(summarize, out_schema)


def exact_topk_via_mg(
    df: DataFrame,
    key_col: str,
    k: int,
    capacity: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Provably exact top-``k`` keys by (weighted) count, with bounded
    per-task state.

    Pass 1 prunes to MG candidates; pass 2 recounts candidates exactly
    (broadcast semi-join — the candidate set is ≤ tasks × capacity
    rows); the k-th recount is then checked against the global MG bound
    N/(capacity+1).  Raises ``ValueError`` when exactness cannot be
    certified, because returning a partition-layout-dependent answer
    from a deterministic engine is worse than failing.

    Ties at the k-th count break on the key string ascending, matching
    the SQL oracle's ``ORDER BY cnt DESC, key`` exactly.
    """
    summ = mg_summaries(df, key_col, capacity, weight_col).localCheckpoint()
    n_total = int(
        summ.where(F.col(key_col).isNull())
        .agg(F.sum("est"))
        .collect()[0][0]
        or 0
    )
    bound = n_total // (capacity + 1)

    candidates = summ.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    keyed = df.select(
        F.col(key_col).cast("string").alias(key_col),
        *([F.col(weight_col)] if weight_col else []),
    ).where(F.col(key_col).isNotNull())
    agg_expr = (
        F.sum(F.when(F.col(weight_col) > 0, F.col(weight_col)).otherwise(0))
        if weight_col
        else F.count(F.lit(1))
    )
    recount = (
        keyed.join(F.broadcast(candidates), key_col, "leftsemi")
        .groupBy(key_col)
        .agg(agg_expr.cast("long").alias("cnt"))
    )
    top = recount.orderBy(F.desc("cnt"), F.asc(key_col)).limit(k)
    rows = top.collect()
    if len(rows) == k and rows[-1]["cnt"] <= bound:
        raise ValueError(
            f"top-{k} not certifiable: k-th candidate count "
            f"{rows[-1]['cnt']} <= MG bound {bound} "
            f"(N={n_total}, capacity={capacity}); raise capacity or run "
            f"the full aggregation"
        )
    if len(rows) < k and bound > 0:
        # Fewer candidates than k with a nonzero undercount bound: a
        # pruned key (true count in [1, bound]) could belong to the true
        # top-k, so the short list is NOT provably complete.  Only a
        # zero bound certifies "fewer than k distinct keys exist".
        raise ValueError(
            f"top-{k} not certifiable: only {len(rows)} candidates "
            f"survived pruning with MG bound {bound} > 0 "
            f"(N={n_total}, capacity={capacity}); raise capacity or run "
            f"the full aggregation"
        )
    # Return the LAZY plan, not createDataFrame(rows): downstream
    # consumers then see a bounded TakeOrderedAndProject (k rows) they
    # can window/join over, and the plan auditors can prove it.  The
    # certificate collect above is the price of exactness; a caller
    # executing the result once more re-runs only the candidate
    # recount (broadcast semi-join, no wide shuffle).
    return top
