"""Online (at-ingest) near-duplicate flagging.

The batch dedup pipeline (operators/dedup.py) finds near-dup pairs
WITHIN a corpus; a streaming corpus also needs each arriving micro-batch
checked AGAINST EVERYTHING ALREADY INGESTED without rescanning it.  The
standard answer is a persisted LSH band index:

- per batch: shingle → minhash signatures → banded bucket keys
- probe: new (band, bucket) keys equi-join the persisted index — only
  hash-colliding history is ever touched, never the full corpus
- score: for candidate pairs, estimated Jaccard = fraction of agreeing
  minhash components (the classic unbiased MinHash estimator) — no
  stored text needed, signatures only
- append: the batch's bands + signatures join the index

State grows O(corpus × bands) rows of 3 longs — the index is ~1% of a
text corpus and partitions on (band, bucket): at 100 TB the probe is a
shuffle of the BATCH against a bucketed index, with AQE handling hot
buckets.  Flags are advisory (estimator noise ~1/sqrt(k)); destructive
dedup downstream re-verifies exactly (jaccard_verify) on the flagged
sliver only.

Reference parity: the reference dedups exact re-sends at ingest
(`src/stockops/data/database/sql_db.py:487-497`); near-dup flagging is
part of the training-data extension surface.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_ops_spark.operators.dedup import (
    band_stack,
    minhash_signatures,
    shingle_sets,
)


class StreamingNearDupIndex:
    """Persisted LSH band index with per-batch probe + append.

    Wire ``process_batch`` into ``foreachBatch`` (streaming) or call it
    directly per ingest batch.  Layout under ``root``:

    - ``bands/``  (id, band, bucket) probe index
    - ``sigs/``   (id, mh_0..mh_{k-1}) signatures for scoring
    - ``flags/``  (new_id, matched_id, est_jaccard) advisory output

    **Single-writer assumption**: one index instance owns ``root`` for
    writes (``process_batch`` / ``maintain``) — exactly the contract a
    Structured Streaming ``foreachBatch`` sink provides.  Concurrent
    READERS are safe across maintenance (rename-aside swap); concurrent
    writers are not coordinated.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self._seq: int | None = None  # recovered lazily from the index

    def _path(self, part: str) -> str:
        return os.path.join(self.root, part)

    def _existing(self, part: str) -> DataFrame | None:
        p = self._path(part)
        if not os.path.isdir(p):
            return None
        df = self.spark.read.parquet(p)
        if "batch_seq" not in df.columns:
            # pre-retention index layout: treat as epoch batch 0
            df = df.withColumn("batch_seq", F.lit(0))
        return df

    def _next_seq(self) -> int:
        """Monotonic batch sequence — recovered from the persisted index
        once per process (one footer-stats max() per dataset), then
        advanced in memory.  Recovery takes the max across ALL THREE
        datasets, not just bands: ``process_batch`` writes flags before
        bands, so a crash between the two writes must not let the next
        writer reuse a sequence already present in ``flags/``."""
        if self._seq is None:
            highest = -1
            for part in ("bands", "sigs", "flags"):
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
        """Probe ``batch`` against the index, append its signatures, and
        return the number of advisory near-dup flags written."""
        seq = self._next_seq()
        sh = shingle_sets(batch, self.id_col, self.text_col, n=self.shingle_n)
        # sever lineage: signatures are consumed by probe AND append, and
        # the append writes under a directory the probe reads
        sigs = minhash_signatures(sh, num_hashes=self.num_hashes).localCheckpoint(
            eager=True
        )
        stacked = band_stack(sigs, num_hashes=self.num_hashes, bands=self.bands)

        n_flags = 0
        idx = self._existing("bands")
        if idx is not None:
            old_sigs = self._existing("sigs")
            cand = (
                stacked.join(
                    idx.select(
                        F.col("id").alias("matched_id"), "band", "bucket"
                    ),
                    ["band", "bucket"],
                )
                .where(F.col("id") != F.col("matched_id"))
                .select(F.col("id").alias("new_id"), "matched_id")
                .distinct()
            )
            agree = sum(
                F.when(F.col(f"l_mh_{i}") == F.col(f"r_mh_{i}"), 1).otherwise(0)
                for i in range(self.num_hashes)
            )
            lsig = sigs.select(
                F.col("id").alias("new_id"),
                *[F.col(f"mh_{i}").alias(f"l_mh_{i}") for i in range(self.num_hashes)],
            )
            rsig = old_sigs.select(
                F.col("id").alias("matched_id"),
                *[F.col(f"mh_{i}").alias(f"r_mh_{i}") for i in range(self.num_hashes)],
            )
            flagged = (
                cand.join(lsig, "new_id")
                .join(rsig, "matched_id")
                .select(
                    "new_id",
                    "matched_id",
                    (agree / F.lit(float(self.num_hashes))).alias("est_jaccard"),
                )
                .where(F.col("est_jaccard") >= self.threshold)
                .localCheckpoint(eager=True)
            )
            n_flags = flagged.count()
            if n_flags:
                # flag_ts (epoch seconds at write) powers AGE-based
                # retention in maintain() — batch_seq counts batches,
                # which is not wall-clock time
                flagged.withColumn("batch_seq", F.lit(seq)).withColumn(
                    "flag_ts", F.lit(float(time.time()))
                ).write.mode("append").parquet(self._path("flags"))

        stacked.withColumn("batch_seq", F.lit(seq)).write.mode("append").parquet(
            self._path("bands")
        )
        sigs.withColumn("batch_seq", F.lit(seq)).write.mode("append").parquet(
            self._path("sigs")
        )
        return n_flags

    def flags(self) -> DataFrame | None:
        return self._existing("flags")

    # -- maintenance ------------------------------------------------------

    @staticmethod
    def _data_files(path: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    out.append(os.path.join(dirpath, f))
        return out

    def maintain(
        self,
        target_files: int = 8,
        max_batches: int | None = None,
        trim_flags: bool = False,
        flags_max_age_s: float | None = None,
    ) -> dict[str, int]:
        """Bound the index's file count and (optionally) its age.

        ``process_batch`` appends one file set per micro-batch forever —
        the same litter debt ``sources/maintenance.compact`` pays down for
        the table store.  Here the index is two flat parquet datasets, so
        maintenance is one bounded rewrite each:

        - **compaction**: when a dataset holds more part-files than
          ``target_files`` (plus slack for one in-flight batch), rewrite
          it to ``target_files`` files.  Materialize-to-temp THEN swap:
          the read fully drains before the original directory is touched,
          so no lineage hazard and a crash mid-rewrite leaves the old
          index intact.
        - **retention** (``max_batches``): drop band/signature rows more
          than ``max_batches`` micro-batches old — the Redis-XTRIM analog
          for the at-ingest index.  The advisory ``flags/`` output is
          compacted but only trimmed when ``trim_flags`` is set (it is a
          downstream-consumed result, not probe state — aging it out is a
          policy decision, so it is opt-in).  At 100 TB the trim is a
          pushed-down ``batch_seq >= cutoff`` filter inside the same
          rewrite, not a second pass.
        - **age retention** (``flags_max_age_s``): drop flags older than
          the given wall-clock age — batches are not time, so a bursty
          stream needs this alongside ``max_batches``.  Uses the
          ``flag_ts`` stamp written per batch; rows predating the stamp
          (older layout) have no timestamp and age out on the first
          age-trim.  Bounded the same way: footer-stats min() probe, then
          a pushed-down filter inside the one rewrite.

        Call every N batches from ``foreachBatch`` or as a nightly job.
        Returns per-dataset file counts after maintenance.
        """
        # peg the cutoff to the writer's current position, not max(file)
        if self._seq is None:
            self._next_seq()
            self._seq -= 1
        cutoff = None if max_batches is None else self._seq - max_batches
        age_cutoff = None if flags_max_age_s is None else time.time() - flags_max_age_s
        out: dict[str, int] = {}
        for part in ("bands", "sigs", "flags"):
            part_cutoff = cutoff
            if part == "flags" and not trim_flags:
                part_cutoff = None
            part_age_cutoff = age_cutoff if part == "flags" else None
            path = self._path(part)
            df = self._existing(part)
            if df is None:
                out[part] = 0
                continue
            # mixed-vintage files: rows predating the batch_seq column
            # surface as null — treat as epoch batch 0, never drop silently
            df = df.withColumn("batch_seq", F.coalesce(F.col("batch_seq"), F.lit(0)))
            if part_age_cutoff is not None:
                ts_col = (
                    F.coalesce(F.col("flag_ts"), F.lit(0.0))
                    if "flag_ts" in df.columns
                    else F.lit(0.0)
                )
                df = df.withColumn("flag_ts", ts_col)
            nfiles = len(self._data_files(path))
            needs_trim = False
            if part_cutoff is not None:
                # footer-stats aggregation (parquet aggregate pushdown) —
                # steady-state calls with nothing to trim touch no data
                mn = df.agg(F.min("batch_seq").alias("m")).collect()[0].m
                needs_trim = mn is not None and mn < part_cutoff
            if part_age_cutoff is not None and not needs_trim:
                mn = df.agg(F.min("flag_ts").alias("m")).collect()[0].m
                needs_trim = mn is not None and mn < part_age_cutoff
            if nfiles <= target_files + 1 and not needs_trim:
                out[part] = nfiles
                continue
            if part_cutoff is not None:
                df = df.where(F.col("batch_seq") >= F.lit(part_cutoff))
            if part_age_cutoff is not None:
                df = df.where(F.col("flag_ts") >= F.lit(part_age_cutoff))
            tmp = f"{path}__rewrite_{uuid.uuid4().hex[:8]}"
            df.repartition(target_files).write.mode("overwrite").parquet(tmp)
            # Swap via rename-aside, not rmtree-then-rename: a concurrent
            # reader's window of absent-path shrinks from O(rmtree of the
            # whole dataset) to the gap between two rename syscalls, and a
            # crash mid-swap leaves either the old or the new index whole.
            # (Single WRITER is still assumed — see class docstring.)
            aside = f"{path}__old_{uuid.uuid4().hex[:8]}"
            os.rename(path, aside)
            os.rename(tmp, path)
            shutil.rmtree(aside)
            out[part] = len(self._data_files(path))
        return out
