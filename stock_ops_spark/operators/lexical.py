"""Incremental lexical retrieval statistics — the BM25 index artifact.

q278 (BM25 top-k) and q303 (RRF hybrid) derive document frequencies,
per-doc length norms and corpus totals from scratch on every run; at
100 TB that tokenize+aggregate pass is hours, and it was the one
artifact family still rebuilt whole per corpus version (the minhash,
containment and co-purchase artifacts already refresh from deltas —
VERDICT r6 #6 closes the gap here).

State = the three tables a lexical search index keeps anyway:

- ``postings``  (id, term, tf)   — the inverted-index rows; also the
  retraction source (you cannot decrement df for a deleted doc without
  knowing which terms it held)
- ``dl``        (id, fp, dl)     — per-doc token length + md5 text
  fingerprint (the change detector, same discipline as
  ``minhash_band_state``)
- ``df``        (term, df)       — doc frequency, FOLDED ±delta style:
  df' = df + |added docs per term| − |removed docs per term|

On a corpus rewrite the cached builder tokenizes ONLY (new ∪ changed)
docs and retracts removed/changed docs through their stored postings —
one bounded pass over the delta, never the corpus.  Corpus scalars
(N docs, T total tokens) derive from ``dl`` by one tiny aggregate.

Tokenization contract is exactly q278/q303's: lowercase, split on
``[^a-z]+``, drop empties — so artifact-served BM25 is bit-identical
to the inline pipeline (the q310 oracle pins it against DuckDB).

Reference parity: none — the reference has no retrieval surface; this
is the LLM-training-data extension (SURVEY §2 north star).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_ops_spark.localrel import local_relation


def tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) token stream — q278's exact tokenizer."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )


def lexical_stats(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Cold build: (postings, dl) for the whole frame.  One tokenize
    pass feeds both aggregates; postings are unique on (id, term)."""
    toks = tokenize(df, id_col, text_col)
    postings = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = (
        df.select(
            F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
        )
        .join(
            toks.groupBy("id").agg(
                F.count(F.lit(1)).cast("bigint").alias("dl")
            ),
            "id",
            "left",
        )
        .fillna({"dl": 0})
    )
    return postings, dl


def doc_frequency(postings: DataFrame) -> DataFrame:
    """(term, df) from scratch — postings are (id, term)-unique, so df
    is a plain count per term."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )


def fold_df(
    old_df: DataFrame, added: DataFrame, removed: DataFrame
) -> DataFrame:
    """±delta fold of document frequency: each added (id, term) posting
    contributes +1, each removed one −1; terms folding to zero leave
    the table.  Exactly equal to recomputing df from the folded
    postings (the delta==full test pins it), at the cost of aggregating
    only the DELTA postings."""
    pos = added.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    neg = removed.groupBy("term").agg(
        (-F.count(F.lit(1))).cast("bigint").alias("d")
    )
    folded = (
        old_df.select("term", F.col("df").alias("d"))
        .unionByName(pos)
        .unionByName(neg)
        .groupBy("term")
        .agg(F.sum("d").cast("bigint").alias("df"))
        .where(F.col("df") > 0)
    )
    return folded


def lexical_stats_delta(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    old_postings: DataFrame,
    old_dl: DataFrame,
    old_df: DataFrame,
    stats: dict | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Refresh (postings, dl, df) from a corpus rewrite by tokenizing
    only (new ∪ changed) docs and retracting removed/changed docs via
    their STORED postings.  Returns the three refreshed tables."""
    fps = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
    ).localCheckpoint(eager=True)
    # docs whose (id, fp) is not in the old state: new or changed text
    fresh_ids = fps.join(old_dl.select("id", "fp"), ["id", "fp"], "left_anti")
    fresh_docs = docs.join(
        fresh_ids.select(F.col("id").alias(id_col)), id_col, "left_semi"
    ).localCheckpoint(eager=True)
    if stats is not None:
        stats["docs_tokenized"] = fresh_docs.count()
    add_postings, add_dl = lexical_stats(fresh_docs, id_col, text_col)
    add_postings = add_postings.localCheckpoint(eager=True)
    # old rows whose (id, fp) is gone: removed docs or stale versions
    keep_old = old_dl.join(fps, ["id", "fp"], "left_semi")
    removed_postings = old_postings.join(
        keep_old.select("id"), "id", "left_anti"
    ).localCheckpoint(eager=True)
    kept_postings = old_postings.join(keep_old.select("id"), "id", "left_semi")
    postings = kept_postings.unionByName(add_postings)
    dl = keep_old.unionByName(add_dl)
    df = fold_df(old_df, add_postings, removed_postings)
    return postings, dl, df


def lexical_stats_cached(
    docs: DataFrame,
    source_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_dir: str | None = None,
    stats: dict | None = None,
) -> dict[str, DataFrame]:
    """Persisted lexical index with incremental refresh — the same
    versioned-family discipline as ``minhash_near_dup_pairs_cached``:
    family digest = source abspath + params + v-tag (stable across
    rewrites), version digest = source mtime+size.  A version miss with
    a complete prior version refreshes from the delta; only a true cold
    start tokenizes the corpus.  Returns {"postings", "dl", "df"}
    reading the published artifacts."""
    from stock_ops_spark.operators import artifacts

    spark = docs.sparkSession
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    famraw = f"v1|{os.path.abspath(source_path)}|{id_col}|{text_col}"
    fam = artifacts.cache_key(famraw)
    ver = artifacts.cache_key(artifacts.source_identity(source_path))
    suffixes = [".postings.parquet", ".dl.parquet", ".df.parquet"]
    paths = {
        s.split(".")[1]: artifacts.versioned_path(
            cache_dir, "lexical", fam, ver, s
        )
        for s in suffixes
    }
    if all(os.path.isdir(p) for p in paths.values()):
        return {k: spark.read.parquet(p) for k, p in paths.items()}
    os.makedirs(cache_dir, exist_ok=True)
    prior = artifacts.find_prior_version(
        cache_dir, "lexical", fam, ver, suffixes
    )
    if prior is not None:
        old = {
            s.split(".")[1]: spark.read.parquet(
                artifacts.versioned_path(cache_dir, "lexical", fam, prior, s)
            )
            for s in suffixes
        }
        postings, dl, df = lexical_stats_delta(
            docs, id_col, text_col,
            old["postings"], old["dl"], old["df"], stats=stats,
        )
    else:
        postings, dl = lexical_stats(docs, id_col, text_col)
        postings = postings.localCheckpoint(eager=True)
        df = doc_frequency(postings)
        if stats is not None:
            stats["docs_tokenized"] = dl.count()
    artifacts.publish(postings, paths["postings"])
    artifacts.publish(dl, paths["dl"])
    artifacts.publish(df, paths["df"])
    return {k: spark.read.parquet(p) for k, p in paths.items()}


def bm25_topk(
    spark,
    postings: DataFrame,
    dl: DataFrame,
    df_table: DataFrame,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-k from the lexical artifact — the
    SAME exact-integer rational scoring as the inline q278 pipeline
    (idf = (2N−2df+1)/(2df+1); tf-norm ×10T; floor at 1e6 scale in
    DECIMAL(38,0)), so artifact-served retrieval is bit-identical to
    the from-scratch run and DuckDB's HUGEINT oracle.  Scale shape:
    the query-term frame and its df rows broadcast; only postings of
    query terms are touched."""
    from pyspark.sql import Window

    scalars = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).collect()[0]
    n_docs, t_total = int(scalars["n"]), int(scalars["t"])
    qterms = local_relation(spark, [(t,) for t in terms], "term string")
    tfq = postings.join(F.broadcast(qterms), "term").select(
        F.col("id").alias("doc_id"), "term", "tf"
    )
    dfq = df_table.join(F.broadcast(qterms), "term")
    num = (
        f"CAST(2 * {n_docs} - 2 * df + 1 AS DECIMAL(38,0))"
        f" * CAST(22 * tf AS DECIMAL(38,0))"
        f" * CAST({t_total} AS DECIMAL(38,0)) * 1000000"
    )
    den = (
        f"CAST(2 * df + 1 AS DECIMAL(38,0))"
        f" * (CAST(10 * {t_total} AS DECIMAL(38,0)) * tf"
        f"    + CAST(3 * {t_total} AS DECIMAL(38,0))"
        f"    + CAST(9 * dl AS DECIMAL(38,0)) * {n_docs})"
    )
    scored = (
        tfq.join(F.broadcast(dfq), "term")
        .join(dl.select(F.col("id").alias("doc_id"), "dl"), "doc_id")
        .select(
            "doc_id",
            F.expr(f"CAST(({num}) DIV ({den}) AS BIGINT)").alias("term_score"),
        )
    )
    docs = scored.groupBy("doc_id").agg(
        F.sum("term_score").cast("bigint").alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("rnk").cast("bigint").alias("rnk"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "score",
            "n_hit_terms",
        )
    )
