"""Incremental ExactSubstr span-dedup state — the positioned-gram
artifact, plus the scrub ACTION.

q318 (per-doc duplicated-span stats) and q319 (corpus scrub-savings
budget) both start from the same corpus pass: split every document,
explode its positioned 4-grams, and aggregate gram→document incidence.
At 100 TB that shared pass dominates both queries and is recomputed per
run; this module persists it once and folds ±deltas on corpus rewrite —
the same fit-once-read-many discipline as the BM25 lexical index
(``operators/lexical.py``), which this module mirrors table for table.

State = three tables:

- ``postings``  (doc_id, p, gram) — every positioned n-gram (1-based
  token position); also the retraction source: you cannot decrement a
  gram's document incidence for a removed doc without knowing which
  grams (and where) it held.
- ``docstats``  (doc_id, fp, n_toks) — md5 text fingerprint (the change
  detector, same discipline as the lexical ``dl`` table) + token count.
  Covers ALL docs, including those too short to emit grams.
- ``gramstats`` (gram, nd, keep_doc) — document incidence ``nd``
  (count of DISTINCT docs containing the gram, folded ±delta) and the
  canonical document ``keep_doc`` (min doc_id over the gram's docs).
  ALL grams are kept (not only nd≥2): a singleton gram becomes a
  duplicate the moment a second doc arrives, and the fold must know
  about the first occurrence to count it.

``min`` is not a ±foldable measure — removing the canonical doc
invalidates it — so the fold recomputes ``keep_doc`` ONLY for grams
whose canonical doc was removed ("min-lost" grams), by one bounded
aggregate over the kept postings of exactly those grams.  Everything
else folds arithmetically from the delta.  The delta==full tests in
``tests/test_span_artifact.py`` pin exact equality for append, change
and remove.

Downstream consumers (all bit-identical to the inline q318/q319
pipelines — the DuckDB from-scratch oracles pin it):

- ``duplicated_spans``  — q318's frame from state tables
- ``scrub_savings``     — q319's one-row budget from state tables
- ``scrub_spans``       — the ACTION (Lee et al., "Deduplicating
  Training Data Makes Language Models Better"): the actual scrubbed
  corpus, removing every token covered by a duplicated span outside
  the gram's canonical document.

Reference parity: none — the reference has no text surface; this is
the LLM-training-data extension (SURVEY §2 north star).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 4-gram windows [p, p+3] overlap or touch exactly when the next
#: start is within GAP positions of the previous — the gaps-and-islands
#: merge bound shared by every consumer below and the q318/q319 oracles.
NGRAM = 4
GAP = 4


def gram_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, p, gram): every positioned NGRAM of every doc with at
    least NGRAM tokens; p is the 1-based position of the gram's first
    token.  split() is staged as its own projected column (the HOF
    lesson: lambda bodies re-evaluate captured expressions per
    element)."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__w"),
    )
    grams = F.expr(
        f"transform(sequence(1, size(__w) - {NGRAM - 1}),"
        f" i -> array_join(slice(__w, i, {NGRAM}), ' '))"
    )
    return (
        d.where(F.size("__w") >= NGRAM)
        .select("doc_id", F.posexplode(grams).alias("p0", "gram"))
        .select("doc_id", (F.col("p0") + 1).cast("bigint").alias("p"), "gram")
    )


def doc_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp, n_toks) for ALL docs — fp is the rewrite detector,
    n_toks the denominator of q318's dup_frac."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("fp"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_toks"),
    )


def gram_stats(postings: DataFrame) -> DataFrame:
    """(gram, nd, keep_doc) from scratch: document incidence + canonical
    (min) doc per gram.  One aggregate over the postings table."""
    return postings.groupBy("gram").agg(
        F.countDistinct("doc_id").cast("bigint").alias("nd"),
        F.min("doc_id").alias("keep_doc"),
    )


def fold_gram_stats(
    old_gs: DataFrame,
    added_postings: DataFrame,
    removed_postings: DataFrame,
    kept_postings: DataFrame,
) -> DataFrame:
    """±delta fold of (gram, nd, keep_doc).

    ``nd`` folds arithmetically: each doc newly holding a gram is +1,
    each removed holder −1 (presence = distinct (gram, doc) pairs of
    the delta postings; a doc repeating a gram still counts once).
    ``keep_doc`` folds as ``least(old, min_added)`` EXCEPT for grams
    whose canonical doc was removed — for exactly those, the true min
    over surviving holders is recomputed from ``kept_postings``
    restricted to the min-lost gram set (one bounded semi-join +
    aggregate, never a full-corpus re-tokenize).  Grams folding to
    nd<=0 leave the table.  Exactly equal to ``gram_stats`` over the
    folded postings (the delta==full tests pin it)."""
    addagg = (
        added_postings.select("gram", "doc_id")
        .distinct()
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("add_nd"),
            F.min("doc_id").alias("add_mn"),
        )
    )
    rem_pres = removed_postings.select("gram", "doc_id").distinct()
    remagg = rem_pres.join(old_gs.select("gram", "keep_doc"), "gram").groupBy(
        "gram"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("rem_nd"),
        F.max(
            (F.col("doc_id") == F.col("keep_doc")).cast("int")
        ).alias("min_lost"),
    )
    lost = remagg.where(F.col("min_lost") == 1).select("gram")
    kept_mn = (
        kept_postings.join(lost, "gram", "left_semi")
        .groupBy("gram")
        .agg(F.min("doc_id").alias("kept_mn"))
    )
    merged = (
        old_gs.join(addagg, "gram", "full_outer")
        .join(remagg, "gram", "left_outer")
        .join(kept_mn, "gram", "left_outer")
    )
    nd2 = (
        F.coalesce(F.col("nd"), F.lit(0))
        + F.coalesce(F.col("add_nd"), F.lit(0))
        - F.coalesce(F.col("rem_nd"), F.lit(0))
    )
    keep2 = F.when(
        F.coalesce(F.col("min_lost"), F.lit(0)) == 1,
        F.least(F.col("kept_mn"), F.col("add_mn")),
    ).otherwise(F.least(F.col("keep_doc"), F.col("add_mn")))
    return merged.select(
        "gram",
        nd2.cast("bigint").alias("nd"),
        keep2.alias("keep_doc"),
    ).where(F.col("nd") > 0)


def span_state(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Cold build: (postings, docstats, gramstats) for the whole frame."""
    postings = gram_postings(docs, id_col, text_col)
    return postings, doc_stats(docs, id_col, text_col), gram_stats(postings)


def span_state_delta(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    old_postings: DataFrame,
    old_docstats: DataFrame,
    old_gramstats: DataFrame,
    stats: dict | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Refresh the three state tables from a corpus rewrite by
    tokenizing ONLY (new ∪ changed) docs and retracting removed/changed
    docs through their STORED postings — one bounded pass over the
    delta, never the corpus (the lexical_stats_delta shape)."""
    fps = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("fp")
    ).localCheckpoint(eager=True)
    fresh_ids = fps.join(
        old_docstats.select("doc_id", "fp"), ["doc_id", "fp"], "left_anti"
    )
    fresh_docs = docs.join(
        fresh_ids.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    ).localCheckpoint(eager=True)
    if stats is not None:
        stats["docs_tokenized"] = fresh_docs.count()
    add_postings = gram_postings(fresh_docs, id_col, text_col).localCheckpoint(
        eager=True
    )
    add_ds = doc_stats(fresh_docs, id_col, text_col)
    keep_old = old_docstats.join(fps, ["doc_id", "fp"], "left_semi")
    removed_postings = old_postings.join(
        keep_old.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    kept_postings = old_postings.join(
        keep_old.select("doc_id"), "doc_id", "left_semi"
    )
    postings = kept_postings.unionByName(add_postings)
    docstats = keep_old.unionByName(add_ds)
    gramstats = fold_gram_stats(
        old_gramstats, add_postings, removed_postings, kept_postings
    )
    return postings, docstats, gramstats


def span_state_cached(
    docs: DataFrame,
    source_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_dir: str | None = None,
    stats: dict | None = None,
) -> dict[str, DataFrame]:
    """Persisted span-dedup state with incremental refresh — the same
    versioned-family discipline as ``lexical_stats_cached``: family
    digest = source abspath + params + v-tag (stable across rewrites),
    version digest = source mtime+size.  A version miss with a complete
    prior version refreshes from the delta; only a true cold start
    tokenizes the corpus.  Returns {"postings", "docstats", "gramstats"}
    reading the published artifacts."""
    from stock_ops_spark.operators import artifacts

    spark = docs.sparkSession
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    famraw = f"v1|{os.path.abspath(source_path)}|{id_col}|{text_col}|{NGRAM}"
    fam = artifacts.cache_key(famraw)
    ver = artifacts.cache_key(artifacts.source_identity(source_path))
    suffixes = [".postings.parquet", ".docstats.parquet", ".gramstats.parquet"]
    paths = {
        s.split(".")[1]: artifacts.versioned_path(
            cache_dir, "spans", fam, ver, s
        )
        for s in suffixes
    }
    if all(os.path.isdir(p) for p in paths.values()):
        return {k: spark.read.parquet(p) for k, p in paths.items()}
    os.makedirs(cache_dir, exist_ok=True)
    prior = artifacts.find_prior_version(
        cache_dir, "spans", fam, ver, suffixes
    )
    if prior is not None:
        old = {
            s.split(".")[1]: spark.read.parquet(
                artifacts.versioned_path(cache_dir, "spans", fam, prior, s)
            )
            for s in suffixes
        }
        postings, docstats, gramstats = span_state_delta(
            docs, id_col, text_col,
            old["postings"], old["docstats"], old["gramstats"], stats=stats,
        )
    else:
        postings, docstats, gramstats = span_state(docs, id_col, text_col)
        if stats is not None:
            stats["docs_tokenized"] = docstats.count()
    artifacts.publish(postings, paths["postings"])
    artifacts.publish(docstats, paths["docstats"])
    artifacts.publish(gramstats, paths["gramstats"])
    return {k: spark.read.parquet(p) for k, p in paths.items()}


def source_gram_projection_cached(
    docs: DataFrame,
    source_path: str,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    cache_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Persisted distinct ``(source, word-n-gram)`` projection, DERIVED
    from the span artifact's positioned ``NGRAM``-gram postings instead
    of a fresh corpus tokenize (VERDICT r10 #7 — q193's hot path).

    Derivation: within a document the postings' positions are the
    consecutive integers 1..(n_toks-NGRAM+1), so the n-gram at p is the
    NGRAM-gram at p extended by the LAST word of each of the grams at
    p+1..p+(n-NGRAM) — a ``lead`` window over the postings (one
    doc-keyed shuffle), never a re-tokenize.  ``lower`` distributes
    over space-joined concatenation, so lowering the reconstructed
    string equals n-gramming ``lower(text)`` exactly — the projection
    is row-identical to the inline
    ``split(lower(text))`` → transform → explode → distinct pipeline
    (pinned by test), and q193's oracle hash is unchanged.

    Versioning: family = source + cols + n + the NGRAM it derives from
    + v-tag; version = source identity — the STALENESS GUARD: a corpus
    rewrite moves the version digest, and the rebuild pulls
    ``span_state_cached`` at that same identity, so the projection can
    never be served against postings of a different corpus version.
    Sources ride a slim (id, source) scan (column-pruned — the text
    column is never read when the span artifact is warm)."""
    from stock_ops_spark.operators import artifacts

    if n < NGRAM:
        raise ValueError(f"projection n-gram must be >= NGRAM ({NGRAM})")
    spark = docs.sparkSession
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    famraw = (
        f"v1|{os.path.abspath(source_path)}|{id_col}|{text_col}"
        f"|{source_col}|n={n}|from={NGRAM}"
    )
    fam = artifacts.cache_key(famraw)
    ver = artifacts.cache_key(artifacts.source_identity(source_path))
    path = artifacts.versioned_path(
        cache_dir, "srcgrams", fam, ver, ".grams.parquet"
    )
    if os.path.isdir(path):
        if stats is not None:
            stats["projection_built"] = False
        return spark.read.parquet(path)
    if stats is not None:
        stats["projection_built"] = True
    st = span_state_cached(
        docs, source_path, id_col=id_col, text_col=text_col,
        cache_dir=cache_dir, stats=stats,
    )
    posts = st["postings"]
    w = Window.partitionBy("doc_id").orderBy("p")
    d = n - NGRAM
    cols = [F.col("gram")]
    cur = posts
    for j in range(1, d + 1):
        cur = cur.withColumn(f"__g{j}", F.lead("gram", j).over(w))
        cols.append(F.element_at(F.split(F.col(f"__g{j}"), " "), -1))
    if d:
        cur = cur.where(F.col(f"__g{d}").isNotNull())
    gram_n = F.lower(F.concat_ws(" ", *cols))
    src_map = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    out = (
        cur.select("doc_id", gram_n.alias("gram"))
        .join(src_map, "doc_id")
        .select("source", "gram")
        .distinct()
    )
    os.makedirs(cache_dir, exist_ok=True)
    artifacts.publish(out, path)
    return spark.read.parquet(path)


def _islands(hits: DataFrame) -> DataFrame:
    """Gaps-and-islands over (doc_id, p) hit positions: merge gram
    intervals whose starts are <= GAP apart into maximal spans; returns
    (doc_id, iid, span_toks, span_lo, span_hi) with span_toks the EXACT
    union length and [span_lo, span_hi] the covered token positions."""
    w1 = Window.partitionBy("doc_id").orderBy("p")
    brk = F.when(F.col("p") - F.lag("p").over(w1) > GAP, 1).otherwise(0)
    iid = F.sum(brk).over(
        w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.withColumn("iid", iid)
        .groupBy("doc_id", "iid")
        .agg(
            (F.max("p") - F.min("p") + NGRAM).alias("span_toks"),
            F.min("p").alias("span_lo"),
            (F.max("p") + NGRAM - 1).alias("span_hi"),
        )
    )


def duplicated_spans(
    postings: DataFrame,
    gramstats: DataFrame,
    docstats: DataFrame,
    min_span: int = NGRAM,
) -> DataFrame:
    """q318's per-doc duplicated-span statistics served from the state
    tables — bit-identical to the inline pipeline (same islands merge,
    same exact integers, same rounding).

    ``min_span`` (Lee et al. use 50 tokens): spans shorter than this
    are dropped AFTER the exact island merge — short incidental matches
    don't count toward coverage, only passages long enough to be real
    duplication.  The default (NGRAM) keeps every span (q318's
    contract); q326 measures at a threshold."""
    dup = gramstats.where(F.col("nd") >= 2).select("gram")
    hits = postings.join(dup, "gram", "left_semi").select("doc_id", "p")
    spans = _islands(hits)
    if min_span > NGRAM:
        spans = spans.where(F.col("span_toks") >= min_span)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.max("span_toks").cast("bigint").alias("max_span"),
            F.sum("span_toks").cast("bigint").alias("covered_tokens"),
        )
        .join(docstats.select("doc_id", "n_toks"), "doc_id")
        .select(
            "doc_id",
            "n_spans",
            "max_span",
            "covered_tokens",
            F.col("n_toks").cast("bigint").alias("n_tokens"),
            F.round(F.col("covered_tokens") / F.col("n_toks"), 6).alias(
                "dup_frac"
            ),
        )
    )


def _scrub_hits(postings: DataFrame, gramstats: DataFrame) -> DataFrame:
    """(doc_id, p) of every NON-canonical duplicated-gram occurrence —
    the positions the scrub removes (q319's hit set)."""
    canon = gramstats.where(F.col("nd") >= 2).select("gram", "keep_doc")
    return (
        postings.join(canon, "gram")
        .where(F.col("doc_id") != F.col("keep_doc"))
        .select("doc_id", "p")
    )


def scrub_savings(
    postings: DataFrame, gramstats: DataFrame, docstats: DataFrame
) -> DataFrame:
    """q319's one-row corpus scrub budget served from the state tables."""
    per_doc = (
        _islands(_scrub_hits(postings, gramstats))
        .groupBy("doc_id")
        .agg(F.sum("span_toks").alias("removable"))
    )
    tot = docstats.agg(
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_touched"),
        F.coalesce(F.sum("removable"), F.lit(0))
        .cast("bigint")
        .alias("removable_tokens"),
    )
    return tot.crossJoin(F.broadcast(agg)).select(
        "n_docs",
        "n_tokens",
        "n_docs_touched",
        "removable_tokens",
        F.round(F.col("removable_tokens") / F.col("n_tokens"), 6).alias(
            "savings_frac"
        ),
    )


def scrub_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
    gramstats: DataFrame | None = None,
    min_span: int = NGRAM,
) -> DataFrame:
    """The ACTION (Lee et al. §4.1 applied at span granularity): the
    scrubbed corpus.  Every token covered by a duplicated span in a
    NON-canonical document is removed; the canonical document (min
    doc_id per gram) keeps its copy, so no shared passage disappears
    from the corpus entirely.  Returns the input frame with ``text``
    replaced by the scrubbed text plus exact accounting columns
    (n_tokens_before / n_tokens_after / removed_tokens).

    Shape: hit positions expand to covered token positions (×NGRAM
    explode of the hit set — bounded by the duplicated text volume, not
    the corpus), collect once per doc, and one map-side array filter
    rebuilds the text; untouched docs pass through the same
    split→filter→join path, which is the identity for single-space
    tokenization, so output text is reproducible from either path.
    Pass the persisted state tables to skip re-tokenizing the corpus;
    without them the hit set is derived inline from ``docs``.

    ``min_span`` (Lee et al. scrub only spans >= 50 tokens): with a
    threshold above NGRAM, islands merge FIRST and only spans at least
    that long are excised — incidental short matches survive.  The
    default path excises every covered position (identical to the
    island union at threshold NGRAM)."""
    if postings is None or gramstats is None:
        postings = gram_postings(docs, id_col, text_col)
        gramstats = gram_stats(postings)
    hits = _scrub_hits(postings, gramstats)
    if min_span > NGRAM:
        rem_pos = (
            _islands(hits)
            .where(F.col("span_toks") >= min_span)
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.col("span_lo"), F.col("span_hi"))
                ).alias("pos"),
            )
        )
    else:
        rem_pos = hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(NGRAM - 1))
            ).alias("pos"),
        )
    rem = (
        rem_pos.distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("__rem"))
    )
    out = docs.join(
        rem.withColumnRenamed("doc_id", id_col), id_col, "left_outer"
    )
    words = F.split(F.col(text_col), " ")
    kept = F.filter(
        words,
        lambda x, i: ~F.coalesce(
            F.array_contains(F.col("__rem"), (i + 1).cast("bigint")),
            F.lit(False),
        ),
    )
    return (
        out.withColumn("__kept", kept)
        .withColumn("n_tokens_before", F.size(words).cast("bigint"))
        .withColumn("n_tokens_after", F.size("__kept").cast("bigint"))
        .withColumn(
            "removed_tokens",
            (F.col("n_tokens_before") - F.col("n_tokens_after")).cast(
                "bigint"
            ),
        )
        .withColumn(text_col, F.array_join(F.col("__kept"), " "))
        .drop("__rem", "__kept")
    )


def scrub_spans_against(
    docs: DataFrame,
    reference: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
    ref_grams: DataFrame | None = None,
) -> DataFrame:
    """SURGICAL decontamination (the span-level twin of q93's
    doc-level drop): remove from ``docs`` every token span covered by
    an NGRAM that also occurs in ``reference`` (the held-out benchmark
    corpus).  Where decontaminate() throws away the whole document for
    one shared passage, this keeps the document and excises exactly the
    contaminated spans — the standard practice when training corpora
    are scarce and benchmark overlap is boilerplate-shaped.

    Shape: the reference's distinct gram set is an aggregate of the
    (small) benchmark side and BROADCASTS into a semi-join against the
    corpus postings — the corpus is never shuffled by gram; everything
    downstream is the scrub_spans explode/collect/filter path, bounded
    by the contaminated text volume.

    Pass ``postings`` (the persisted span artifact, restricted to the
    training docs) and/or ``ref_grams`` (a precomputed distinct gram
    frame — e.g. the artifact's postings restricted to the benchmark
    split) to skip re-tokenizing either side; when both splits live in
    one corpus, ONE artifact serves both."""
    if reference is None and ref_grams is None:
        raise ValueError("need a reference frame or a ref_grams table")
    if ref_grams is None:
        ref_grams = gram_postings(reference, id_col, text_col).select(
            "gram"
        ).distinct()
    if postings is None:
        postings = gram_postings(docs, id_col, text_col)
    hits = postings.join(
        F.broadcast(ref_grams), "gram", "left_semi"
    ).select("doc_id", "p")
    rem = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(NGRAM - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("__rem"))
    )
    out = docs.join(
        rem.withColumnRenamed("doc_id", id_col), id_col, "left_outer"
    )
    words = F.split(F.col(text_col), " ")
    kept = F.filter(
        words,
        lambda x, i: ~F.coalesce(
            F.array_contains(F.col("__rem"), (i + 1).cast("bigint")),
            F.lit(False),
        ),
    )
    return (
        out.withColumn("__kept", kept)
        .withColumn("n_tokens_before", F.size(words).cast("bigint"))
        .withColumn("n_tokens_after", F.size("__kept").cast("bigint"))
        .withColumn(
            "removed_tokens",
            (F.col("n_tokens_before") - F.col("n_tokens_after")).cast(
                "bigint"
            ),
        )
        .withColumn(text_col, F.array_join(F.col("__kept"), " "))
        .drop("__rem", "__kept")
    )
