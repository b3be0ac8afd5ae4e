"""Exact bounded edit-distance self-join via segment pigeonholing
(the PassJoin family: Li, Deng, Wang, Feng — "PassJoin: A Partition-based
Method for Similarity Joins", VLDB 2012).

The brand-blocked fuzzy join (q79) is optimal for SHORT strings (7–12
chars): at that length ~6% of all pairs match, the output itself is
quadratic, and any exact algorithm is Ω(output).  For LONG strings with
sparse matches (document prefixes, titles, URLs) a blocked product is
the wrong shape at scale — the measured exponent of the fixed-block
scheme is k≈1.9 (SCALING.md).  This operator replaces the product with
an equi-join:

- every string s of length l ≥ k+1 is partitioned into k+1 contiguous
  segments (a deterministic function of l alone);
- if ed(r, s) ≤ k then at least one segment of s is untouched by any
  edit (pigeonhole over ≤ k edits into k+1 segments) and appears in r
  VERBATIM, shifted by x = (#ins − #del before it).  Edits before the
  segment number ≥ |x| and edits after ≥ |Δ − x| (Δ = len(r) − len(s)),
  so |x| + |Δ − x| ≤ k, i.e. x ∈ [⌈(Δ−k)/2⌉, ⌊(Δ+k)/2⌋] — a window of
  at most k+1 starting positions per (probe-length, segment) slot;
- the join on (indexed-length, slot, segment-text) therefore has 100%
  recall; a bounded-DP ``levenshtein(a, b, k)`` verifies candidates.

Cost: each string emits k+1 index segments and at most
(2k+1)·(k+1)·(k+1) probe substrings — O(k²) rows per string instead of
O(block-size) comparisons, one shuffle on short substring keys, no
product anywhere.  Strings of length ≤ k pair with each other trivially
(ed ≤ max(len) ≤ k) through a dedicated tiny bucket; their pairs with
longer strings ride the normal probe path (the short side probes the
long side's segments).

The reference has no fuzzy matching at all; this extends the
catalog-reconciliation surface (q79) with the shape that survives 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with edit distance ≤ k between
    their ``str_col`` values — exact, product-free.

    Returns ``block_cols… , id_a, id_b, dist``.  NULL strings never
    match anything (SQL semantics); empty strings participate (ed('',
    s) = len(s)).  With ``block_cols``, pairs are restricted to equal
    block values (the blocks further prune the equi-join; correctness
    does not depend on them).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    blocks = list(block_cols or [])
    kk = k + 1  # number of segments

    base = (
        df.select(
            *blocks,
            F.col(id_col).alias("__id"),
            F.col(str_col).alias("__s"),
        )
        .where(F.col("__s").isNotNull())
        .withColumn("__l", F.length("__s").cast("int"))
    )

    # ---- tiny bucket: len ≤ k strings pair with each other trivially
    # (ed ≤ max(la, lb) ≤ k).  Their pairs with ≥ k+1 strings go through
    # the probe path below.
    # The all-pairs sliver must stay a hash join, not a
    # CartesianProduct/BNLJ (registry plan audit): a lit(1) key would be
    # constant-folded into `ON true`, so the key is a runtime-constant
    # expression over a column, which Catalyst cannot fold.
    tiny = base.where(F.col("__l") <= k).withColumn(
        "__one", F.pmod(F.xxhash64("__s"), F.lit(1))
    )
    ta = tiny.select(
        *blocks, "__one", F.col("__id").alias("__ia"), F.col("__s").alias("__sa")
    )
    tb = tiny.select(
        *blocks, "__one", F.col("__id").alias("__ib"), F.col("__s").alias("__sb")
    )
    tiny_pairs = (
        ta.join(tb, blocks + ["__one"])
        .where(F.col("__ia") < F.col("__ib"))
        .drop("__one")
    )

    # ---- segment arithmetic, shared by both sides.
    # base length b = l div (k+1), remainder r = l mod (k+1); the first
    # (k+1 − r) slots have length b, the last r slots b+1:
    #   len(l, i)   = b + (i ≥ k+1−r)
    #   start(l, i) = i·b + max(0, i − (k+1−r))      (0-based)
    # NB: both expansions are wrapped in one outer paren — they are sums,
    # and callers subtract them (`__l - seg_len - seg_start`), so an
    # unparenthesized expansion would distribute the minus over only the
    # first term (caught by the mixed-corpus brute-force test).
    def _seg_len(l: str, i: str) -> str:
        return (
            f"((({l}) div {kk}) + (CASE WHEN ({i}) >= ({kk} - (({l}) % {kk}))"
            f" THEN 1 ELSE 0 END))"
        )

    def _seg_start(l: str, i: str) -> str:
        return (
            f"(({i}) * (({l}) div {kk})"
            f" + greatest(0, ({i}) - ({kk} - (({l}) % {kk}))))"
        )

    # ---- index side: one row per (string, slot).  PERF (r8): the full
    # string does NOT ride the index/probe/dedup shuffles — segments and
    # ids only; strings re-attach by id onto the (sparse) deduped pair
    # set just before DP verification.  At sf1 (50k prefix-80 docs) the
    # probe side is ~11M rows, so dropping the 80-char payload cuts the
    # candidate join's shuffle ~4× for identical output (measured
    # end-to-end on q234 at sf1: 25.1 s → 15.5 s, 1.6×).
    idx = (
        base.where(F.col("__l") >= kk)
        .select(
            *blocks,
            F.col("__id").alias("__idx_id"),
            F.col("__s").alias("__idx_s"),
            F.col("__l").alias("__jl"),
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("__ji"),
        )
        .withColumn(
            "__jseg",
            F.expr(
                f"substring(__idx_s, {_seg_start('__jl', '__ji')} + 1, "
                f"{_seg_len('__jl', '__ji')})"
            ),
        )
        .drop("__idx_s")
    )

    # ---- probe side: for every candidate indexed length l ∈
    # [max(m−k, k+1), m+k] and slot i, substrings of the probe at starts
    # start(l,i) + x for x in the pigeonhole window
    #   [⌈(Δ−k)/2⌉, ⌊(Δ+k)/2⌋] ∩ [−start, m − len − start],  Δ = m − l.
    # Both div operands are non-negative by construction, so `div` is a
    # true floor; sequence() ranges are guarded (sequence DESCENDS when
    # hi < lo).
    #
    # PERF (r8, made lazy r9): candidate lengths are pruned to lengths
    # that ACTUALLY EXIST on the index side.  Probes to absent lengths
    # join nothing, but on a near-uniform-length corpus (document
    # prefixes: ~every string is 80 chars) they were ~(2k)/(2k+1) of
    # all probe rows — measured on q234 at sf1: 21.3 → 11.3 s (1.9×).
    # r9: the prune is a BROADCAST LEFT-SEMI JOIN against the index's
    # distinct lengths (≤ one row per possible string length), applied
    # AFTER exploding the cheap candidate-length list but BEFORE the
    # expensive per-(length, slot, shift) substring explode — same
    # pruning power, but fully lazy: no Spark job fires at operator
    # construction, no literal array is baked into the plan, and a
    # recomputed/non-deterministic input re-derives its own lengths
    # inside the one plan (the eager snapshot could silently drop true
    # pairs if the source changed between construction and execution).
    idx_lens_df = (
        base.where(F.col("__l") >= kk).select(F.col("__l").alias("__jl")).distinct()
    )
    cand_lens_expr = f"""
        CASE WHEN __l + {k} >= greatest(__l - {k}, {kk})
             THEN sequence(greatest(__l - {k}, {kk}), __l + {k})
             ELSE array() END
    """
    prb_lens = (
        base.where(F.col("__l") >= 1)
        .select(
            *blocks,
            F.col("__id").alias("__prb_id"),
            "__s",
            "__l",
            F.explode(F.expr(cand_lens_expr)).alias("__jl"),
        )
        .join(F.broadcast(idx_lens_df), "__jl", "left_semi")
    )
    # per surviving (probe, candidate length): slots i and pigeonhole
    # shifts x, with the substring computed only now (post-prune)
    probe_expr = f"""
      flatten(transform(sequence(0, {k}), i ->
        transform(
          CASE WHEN least((__l - __jl + {k}) div 2,
                          __l - {_seg_len('__jl', 'i')} - {_seg_start('__jl', 'i')})
                    >= greatest(-(({k} - (__l - __jl)) div 2),
                                -{_seg_start('__jl', 'i')})
               THEN sequence(
                      greatest(-(({k} - (__l - __jl)) div 2),
                               -{_seg_start('__jl', 'i')}),
                      least((__l - __jl + {k}) div 2,
                            __l - {_seg_len('__jl', 'i')} - {_seg_start('__jl', 'i')}))
               ELSE array() END,
          x -> struct(
            i AS __ji,
            substring(__s, {_seg_start('__jl', 'i')} + x + 1,
                      {_seg_len('__jl', 'i')}) AS __jseg))
      ))
    """
    prb = (
        prb_lens.select(
            *blocks,
            "__prb_id",
            "__jl",
            F.explode(F.expr(probe_expr)).alias("__p"),
        )
        .select(
            *blocks,
            "__prb_id",
            "__jl",
            F.col("__p.__ji").alias("__ji"),
            F.col("__p.__jseg").alias("__jseg"),
        )
    )

    join_keys = blocks + ["__jl", "__ji", "__jseg"]
    cand = (
        prb.join(idx, join_keys)
        .where(F.col("__prb_id") != F.col("__idx_id"))
        .select(
            *blocks,
            F.least("__prb_id", "__idx_id").alias("__ia"),
            F.greatest("__prb_id", "__idx_id").alias("__ib"),
        )
        .dropDuplicates(blocks + ["__ia", "__ib"])
    )

    # tiny-tiny pairs cannot also arise from the probe path (the index
    # side requires len ≥ k+1), so the union is duplicate-free after
    # cand's own dedup.
    pairs = cand.unionByName(
        tiny_pairs.select(*blocks, "__ia", "__ib")
    )

    sa = base.select(
        *blocks, F.col("__id").alias("__ia"), F.col("__s").alias("__sa")
    )
    sb = base.select(
        *blocks, F.col("__id").alias("__ib"), F.col("__s").alias("__sb")
    )
    verified = (
        pairs.join(sa, blocks + ["__ia"])
        .join(sb, blocks + ["__ib"])
        .withColumn("__d", F.expr(f"levenshtein(__sa, __sb, {k})"))
        .where(F.col("__d") >= 0)  # bounded DP returns -1 past the threshold
    )
    return verified.select(
        *blocks,
        F.col("__ia").alias("id_a"),
        F.col("__ib").alias("id_b"),
        F.col("__d").cast("bigint").alias("dist"),
    )
