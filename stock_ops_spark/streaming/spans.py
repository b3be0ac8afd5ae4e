"""Online (at-ingest) duplicated-SPAN flagging.

The batch span pipeline (operators/spans.py) measures how much of each
document is covered by cross-document duplicated 4-grams; a streaming
corpus needs each arriving micro-batch measured AGAINST EVERYTHING
ALREADY INGESTED without rescanning it.  The state is the smallest
thing that answers "has this gram been seen before": the DISTINCT gram
set of the corpus so far.

- per batch: positioned 4-grams (the operators/spans.py tokenizer —
  identical grams, identical positions)
- probe: a batch gram is DUPLICATED iff it exists in the index (some
  prior doc held it) OR occurs in ≥2 distinct docs of this batch —
  which is exactly ``nd ≥ 2`` over the corpus so far, so the flags for
  a batch EQUAL the batch-mode ``duplicated_spans`` over the full
  corpus restricted to that batch's docs (the equivalence test pins
  it).  Like every online flagger, the check is one-sided: the PRIOR
  holder of a gram was not flagged at its own ingest (its nd was 1
  then) — history is never rewritten, downstream batch jobs (q318)
  re-measure the whole corpus when both sides matter.
- append: only the batch's NEW grams join the index (anti-join), so
  index growth is the corpus's gram-vocabulary growth, sublinear in
  tokens on natural text.

State is one flat parquet dataset of (gram, batch_seq) — at 100 TB the
probe is a shuffle of the BATCH against a bucketed gram index, never a
corpus scan.  Single-writer contract and maintenance discipline are
``StreamingNearDupIndex``'s (streaming/dedup.py).

Reference parity: none (training-data extension surface; the batch
twins are q318/q319/q320).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_ops_spark.operators.spans import NGRAM, _islands, gram_postings


class StreamingSpanIndex:
    """Persisted distinct-gram index with per-batch probe + append.

    Wire ``process_batch`` into ``foreachBatch`` (streaming) or call it
    directly per ingest batch.  Layout under ``root``:

    - ``grams/``  (gram, batch_seq) distinct-gram probe index
    - ``flags/``  per-doc span stats of flagged docs (q318's columns +
      batch_seq)

    **Single-writer assumption** as in ``StreamingNearDupIndex``.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_dup_frac: float = 0.0,
    ):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        #: advisory threshold: only docs with dup_frac >= this are
        #: written to flags/ (0.0 = every doc with any duplicated span)
        self.min_dup_frac = min_dup_frac
        self._seq: int | None = None

    def _path(self, part: str) -> str:
        return os.path.join(self.root, part)

    def _existing(self, part: str) -> DataFrame | None:
        p = self._path(part)
        if not os.path.isdir(p):
            return None
        return self.spark.read.parquet(p)

    def _next_seq(self) -> int:
        """Monotonic batch sequence, recovered from BOTH datasets (flags
        are written before grams, so a crash between the writes must not
        reuse a sequence already present in flags/)."""
        if self._seq is None:
            highest = -1
            for part in ("grams", "flags"):
                ds = self._existing(part)
                if ds is None:
                    continue
                row = ds.agg(F.max("batch_seq").alias("m")).collect()[0]
                if row.m is not None:
                    highest = max(highest, int(row.m))
            self._seq = highest + 1
        out = self._seq
        self._seq += 1
        return out

    def process_batch(self, batch: DataFrame) -> int:
        """Probe ``batch`` against the index, append its new grams, and
        return the number of per-doc span flags written."""
        seq = self._next_seq()
        posts = gram_postings(batch, self.id_col, self.text_col).localCheckpoint(
            eager=True
        )
        batch_dup = (
            posts.select("gram", "doc_id")
            .distinct()
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .select("gram")
        )
        idx = self._existing("grams")
        seen = (
            posts.join(idx.select("gram"), "gram", "left_semi").select("gram").distinct()
            if idx is not None
            else self.spark.createDataFrame([], "gram string")
        )
        dup = seen.unionByName(batch_dup).distinct()
        hits = posts.join(dup, "gram", "left_semi").select("doc_id", "p")
        ntok = batch.select(
            F.col(self.id_col).alias("doc_id"),
            F.size(F.split(F.col(self.text_col), " ")).cast("bigint").alias(
                "n_tokens"
            ),
        )
        flags = (
            _islands(hits)
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                F.max("span_toks").cast("bigint").alias("max_span"),
                F.sum("span_toks").cast("bigint").alias("covered_tokens"),
            )
            .join(ntok, "doc_id")
            .select(
                "doc_id",
                "n_spans",
                "max_span",
                "covered_tokens",
                "n_tokens",
                F.round(F.col("covered_tokens") / F.col("n_tokens"), 6).alias(
                    "dup_frac"
                ),
            )
            .where(F.col("dup_frac") >= F.lit(self.min_dup_frac))
            .localCheckpoint(eager=True)
        )
        n_flags = flags.count()
        if n_flags:
            flags.withColumn("batch_seq", F.lit(seq)).write.mode(
                "append"
            ).parquet(self._path("flags"))
        new_grams = posts.select("gram").distinct()
        if idx is not None:
            new_grams = new_grams.join(idx.select("gram"), "gram", "left_anti")
        new_grams.withColumn("batch_seq", F.lit(seq)).write.mode(
            "append"
        ).parquet(self._path("grams"))
        return n_flags

    def flags(self) -> DataFrame | None:
        return self._existing("flags")

    def maintain(self, target_files: int = 8) -> dict[str, int]:
        """Bound the per-batch file litter: rewrite any dataset holding
        more part-files than ``target_files`` (plus one in-flight batch
        of slack) down to ``target_files``, via the same
        materialize-to-temp + rename-aside swap as the LSH index.  No
        retention knob: the gram index IS the dedup memory — aging grams
        out silently un-flags future duplicates (the LSH index ages only
        its advisory output, never silently; here even that stays
        opt-out until a consumer needs it)."""
        out: dict[str, int] = {}
        for part in ("grams", "flags"):
            path = self._path(part)
            df = self._existing(part)
            if df is None:
                out[part] = 0
                continue
            files = [
                os.path.join(dp, f)
                for dp, _d, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
            if len(files) <= target_files + 1:
                out[part] = len(files)
                continue
            tmp = f"{path}__rewrite_{uuid.uuid4().hex[:8]}"
            df.repartition(target_files).write.mode("overwrite").parquet(tmp)
            aside = f"{path}__old_{uuid.uuid4().hex[:8]}"
            os.rename(path, aside)
            os.rename(tmp, path)
            shutil.rmtree(aside)
            out[part] = target_files
        return out


__all__ = ["StreamingSpanIndex", "NGRAM"]
