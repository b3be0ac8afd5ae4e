"""Declarative corpus-curation pipeline: the end-to-end funnel a
training-data build runs over raw documents — benchmark split, quality
gates, exact dedup, near-dedup, decontamination — composed from the
engine's existing operators with per-stage row accounting.

The reference drives its multi-step flows through a command-dict
dispatch (``datapipe_ui`` workflows; the batch twin lives at
``sources/services.py:130``); this module is the corpus-curation
equivalent: each stage is a named ``DataFrame -> DataFrame`` transform,
the chain stays ONE lazy plan, and row accounting uses the two shapes
that exist at scale:

- ``run()``   — single-action path: every stage's output row count is
  collected through ``DataFrame.observe`` (Spark's Observation API), so
  the whole funnel executes as ONE job — no per-stage count() passes.
  This is the 100 TB shape: the counts ride the write/collect action.
- ``funnel()`` — reporting twin: a union of per-stage count aggregates,
  used by the oracled q260 (DuckDB replays the same funnel in SQL).
  Costs one scan per stage; exists for verification, not production.

Stage semantics (all exact / deterministic, shared with their
standalone query twins so each piece is independently oracle-verified):

- drop_benchmark: remove the held-out slice (doc_id % 23 = 0 — the q93
  convention).
- quality: Gopher-style gates (q92): mean word length <= 4.8, stopword
  fraction <= 0.12, duplicate-word fraction <= 0.6.
- exact_dedup: keep the min doc_id per exact text (q15's fingerprint
  groupBy; md5 collision odds are the house-accepted 2^-64 regime).
- near_dedup: drop a doc when any SMALLER surviving doc matches it at
  exact Jaccard >= 0.5 over 8-char shingles (q21's verified pair set,
  restricted to survivors; one level, no cascade — the rule is
  deterministic and SQL-expressible, documented in q260's oracle).
- decontaminate: drop docs sharing any distinct word 4-gram with the
  benchmark slice (q93's broadcast-probe shape).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from stock_ops_spark.functions import text as TXT


@dataclass(frozen=True)
class Stage:
    name: str
    apply: Callable[[DataFrame], DataFrame]


# ---------------------------------------------------------------------------
# stage factories
# ---------------------------------------------------------------------------


def drop_benchmark(modulus: int = 23) -> Stage:
    return Stage(
        "drop_benchmark",
        lambda df: df.where(F.col("doc_id") % modulus != 0),
    )


def quality_gates(
    max_mean_wlen: float = 4.8,
    max_stop_frac: float = 0.12,
    max_dup_frac: float = 0.6,
) -> Stage:
    """q92's three exact-ratio gates as one map-side predicate."""

    def apply(df: DataFrame) -> DataFrame:
        w = F.split(F.col("text"), " ")
        n_w = F.size(w)
        n_letters = F.length(F.regexp_replace(F.col("text"), " ", ""))
        mean_wlen = n_letters * F.lit(1.0) / n_w
        stop = F.size(F.filter(w, lambda x: x.isin("a", "the"))) * F.lit(1.0) / n_w
        dup = F.lit(1.0) - F.size(F.array_distinct(w)) * F.lit(1.0) / n_w
        return df.where(
            (mean_wlen <= max_mean_wlen)
            & (stop <= max_stop_frac)
            & (dup <= max_dup_frac)
        )

    return Stage("quality", apply)


def exact_dedup() -> Stage:
    """Keep the min doc_id per exact text — one fingerprint shuffle."""

    def apply(df: DataFrame) -> DataFrame:
        keep = F.min("doc_id").over(
            Window.partitionBy(TXT.fingerprint_md5(F.col("text")))
        )
        return df.withColumn("__keep", keep).where(
            F.col("doc_id") == F.col("__keep")
        ).drop("__keep")

    return Stage("exact_dedup", apply)


def near_dedup(pairs_fn: Callable[[], DataFrame]) -> Stage:
    """Drop docs matched (Jaccard >= threshold) by any SMALLER surviving
    doc.  ``pairs_fn`` supplies the verified pair set (id_a < id_b) —
    typically the cached minhash artifact; restricting corpus-wide pairs
    to survivors is exact because a pair over a subset is the same pair
    over the full set with both endpoints in the subset."""

    def apply(df: DataFrame) -> DataFrame:
        pairs = pairs_fn().select("id_a", "id_b")
        # a pair kills id_b only if id_a itself survived the prior stages
        killers = pairs.join(
            df.select(F.col("doc_id").alias("id_a")), "id_a", "leftsemi"
        ).select(F.col("id_b").alias("doc_id")).distinct()
        return df.join(killers, "doc_id", "left_anti")

    return Stage("near_dedup", apply)


def decontaminate(benchmark: DataFrame, n: int = 4) -> Stage:
    """Drop docs sharing any distinct word n-gram with the benchmark
    frame — q93's shape: the benchmark gram set broadcasts, the
    training side stays a map-side probe (left_anti on a broadcast
    right side never shuffles the corpus)."""

    def grams(df: DataFrame) -> DataFrame:
        g = F.array_distinct(
            F.expr(
                f"CASE WHEN size(words) >= {n} THEN "
                f"transform(sequence(1, size(words) - {n - 1}), "
                f"i -> array_join(slice(words, i, {n}), ' ')) "
                "ELSE array() END"
            )
        )
        return (
            df.select("doc_id", F.split("text", " ").alias("words"))
            .select("doc_id", F.explode(g).alias("gram"))
        )

    def apply(df: DataFrame) -> DataFrame:
        bench_grams = F.broadcast(grams(benchmark).select("gram").distinct())
        dirty = (
            grams(df)
            .join(bench_grams, "gram", "leftsemi")
            .select("doc_id")
            .distinct()
        )
        return df.join(dirty, "doc_id", "left_anti")

    return Stage("decontaminate", apply)


def span_scrub() -> Stage:
    """ExactSubstr span scrub as a curation stage (Lee et al.): rewrite
    ``text`` in place, removing every token covered by a duplicated
    4-gram span outside the gram's canonical document.  Unlike the
    row-dropping stages this one transforms rows (rows_out is
    unchanged); its effect shows up in the token accounting columns it
    leaves behind (n_tokens_before / n_tokens_after / removed_tokens),
    summable by an ``observe()`` on the returned frame in the same
    single job as the stage row counts.  Computed over the CURRENT surviving
    frame — scrubbing after dedup stages means each duplicated gram's
    canonical doc is a survivor, so its copy of the passage survives
    unless a DIFFERENT gram's non-canonical span overlaps it there (the
    precise guarantee pinned in tests/test_span_artifact.py)."""
    from stock_ops_spark.operators.spans import scrub_spans

    return Stage("span_scrub", lambda df: scrub_spans(df))


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------


class CorpusPipeline:
    def __init__(self, stages: list[Stage]):
        if not stages:
            raise ValueError("pipeline needs at least one stage")
        names = [s.name for s in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names: {names}")
        self.stages = stages

    def run(self, docs: DataFrame) -> tuple[DataFrame, dict[str, Observation]]:
        """Chain every stage into ONE lazy plan with an Observation after
        each — executing any single action on the returned frame (write,
        collect) populates every stage's ``rows_out`` metric in the same
        job.  Returns (curated_frame, {stage_name: Observation})."""
        obs: dict[str, Observation] = {}
        cur = docs
        for st in self.stages:
            cur = st.apply(cur)
            o = Observation(st.name)
            cur = cur.observe(o, F.count(F.lit(1)).alias("rows_out"))
            obs[st.name] = o
        return cur, obs

    def funnel(self, docs: DataFrame) -> DataFrame:
        """Reporting twin: (stage_idx, stage, rows_out) for the input and
        every stage — one count aggregate per stage, unioned.  Used by
        the oracled funnel query; production row accounting uses
        ``run()``'s Observations instead (single job).

        Each stage output is LAZILY localCheckpointed: the six count
        aggregates execute in one action, and without the checkpoint
        each would re-run the whole stage-chain prefix (O(stages²)
        recomputation — measured 2.5 s → ~1.7 s warm at sf0.1)."""
        frames = [
            docs.agg(
                F.lit(0).alias("stage_idx"),
                F.lit("input").alias("stage"),
                F.count(F.lit(1)).cast("bigint").alias("rows_out"),
            )
        ]
        cur = docs
        for i, st in enumerate(self.stages, 1):
            cur = st.apply(cur).localCheckpoint(eager=False)
            frames.append(
                cur.agg(
                    F.lit(i).alias("stage_idx"),
                    F.lit(st.name).alias("stage"),
                    F.count(F.lit(1)).cast("bigint").alias("rows_out"),
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.orderBy("stage_idx")


def auto_near_dup_pairs(
    docs: DataFrame, threshold: float = 0.5
) -> Callable[[], DataFrame]:
    """Default pair supplier for the curation funnel: the full minhash
    pipeline with the hot-bucket cap AUTO-SIZED from a banded-index
    probe (``plans.sizing.lsh_max_bucket``) — ON by default here and
    only here, because the funnel's stage order guarantees the cap's
    documented precondition (exact dedup has already run before
    near-dedup consumes the pairs).  On healthy corpora the probe
    returns None and the plan is identical to the uncapped build; on
    boilerplate-heavy corpora it cuts the quadratic hot-bucket term
    with a provably identical verified pair set (band redundancy —
    pinned at sf0.3 in tests and measured at sf10 in SCALING.md).
    Oracled callers pass their own ``pairs_fn`` and are unaffected."""
    from stock_ops_spark.operators.dedup import minhash_near_dup_pairs

    def pairs() -> DataFrame:
        return minhash_near_dup_pairs(
            docs, "doc_id", "text", threshold=threshold, max_bucket="auto"
        )

    return pairs


def standard_curation(
    docs: DataFrame,
    pairs_fn: Callable[[], DataFrame] | None = None,
    modulus: int = 23,
) -> CorpusPipeline:
    """The canonical five-stage curation funnel over a documents frame.
    ``pairs_fn`` defaults to the auto-capped minhash build
    (``auto_near_dup_pairs``); pass the cached artifact (q260 does) to
    reuse a persisted pair set."""
    if pairs_fn is None:
        pairs_fn = auto_near_dup_pairs(docs)
    benchmark = docs.where(F.col("doc_id") % modulus == 0)
    return CorpusPipeline(
        [
            drop_benchmark(modulus),
            quality_gates(),
            exact_dedup(),
            near_dedup(pairs_fn),
            decontaminate(benchmark),
        ]
    )
