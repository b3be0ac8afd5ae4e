"""Shared machinery for persisted streaming fold-state indexes —
append-only parquet tables folded per micro-batch under a per-seq
commit protocol (StreamingSpanIndex, StreamingIVFIndex).

One discipline, factored once (r11):

- **per-seq commit markers**: a batch_seq's appends are not atomic as a
  group; ``_commits/<seq>.pending`` is touched before the first append
  and renamed (atomic) to ``_commits/<seq>`` after the last.  On every
  entry point a leftover ``.pending`` identifies a crashed fold and
  that seq's rows are pruned from ALL tables before the redelivery
  check runs — the redelivered batch then folds as if the crashed
  attempt never happened.  Common path: one listdir, zero Spark jobs.
- **rename-aside swap** (``_swap_in``) with crash-window healing
  (``_recover``): a compaction or prune writes to a ``__rewrite_`` tmp,
  renames the live dataset aside, renames the tmp live, drops the
  aside; a crash between the renames leaves a complete rewrite+aside
  pair that the next touch swaps back instead of silently restarting
  the index empty.
- **marker-derived sequences** (``_next_seq``): committed markers are
  authoritative (zero jobs); legacy pre-marker state falls back to a
  one-time scan of every dataset.
- **``maintain``**: bounds per-batch file litter by rewriting any
  dataset holding more part-files than the target; subclasses hook
  ``_compact_df`` to merge log-structured partials during the rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FoldStateIndex:
    """Base for persisted streaming fold states.  Subclasses set
    ``PARTS`` (the state table names under ``root``) and implement
    ``process_batch``."""

    PARTS: tuple[str, ...] = ()

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._seq: int | None = None

    def _path(self, part: str) -> str:
        return os.path.join(self.root, part)

    # ---- per-seq commit markers

    def _commits_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    def _mark_pending(self, seq: int) -> None:
        os.makedirs(self._commits_dir(), exist_ok=True)
        with open(os.path.join(self._commits_dir(), f"{seq}.pending"), "w"):
            pass

    def _mark_committed(self, seq: int) -> None:
        d = self._commits_dir()
        os.replace(
            os.path.join(d, f"{seq}.pending"), os.path.join(d, str(seq))
        )

    def _recover_crashed(self) -> None:
        """Prune every table of rows belonging to seqs whose fold
        crashed mid-append (a ``.pending`` marker survived) so the
        redelivered batch folds as if the crashed attempt never
        happened.  No-op (one listdir, zero jobs) when no marker
        exists — the common path."""
        try:
            names = os.listdir(self._commits_dir())
        except FileNotFoundError:
            return
        bad = [
            int(n[: -len(".pending")]) for n in names if n.endswith(".pending")
        ]
        if not bad:
            return
        for part in self.PARTS:
            df = self._existing(part)
            if df is None:
                continue
            self._swap_in(part, df.where(~F.col("batch_seq").isin(bad)))
        for s in bad:
            os.remove(os.path.join(self._commits_dir(), f"{s}.pending"))
        self._seq = None  # recompute past the pruned state

    # ---- dataset access with crash-window healing

    def _recover(self, part: str) -> None:
        """Heal ``_swap_in``'s rename-aside crash window: a crash
        between the two renames leaves NO live dataset but a COMPLETE
        ``__rewrite_`` (written fully before the swap began) and a
        complete ``__old_`` aside — without recovery the index would
        silently restart empty.  Recovery: finish the swap (prefer the
        compacted rewrite; the aside holds identical rows).  When the
        live dataset EXISTS, any sibling is pre-swap litter (a partial
        rewrite, or an aside whose drop crashed) — remove."""
        live = self._path(part)
        base = os.path.basename(live)
        try:
            sibs = [
                os.path.join(self.root, n)
                for n in os.listdir(self.root)
                if n.startswith((f"{base}__rewrite_", f"{base}__old_"))
            ]
        except FileNotFoundError:
            return
        if os.path.isdir(live):
            for s in sibs:
                shutil.rmtree(s, ignore_errors=True)
            return
        rewrites = [s for s in sibs if f"{base}__rewrite_" in s]
        asides = [s for s in sibs if f"{base}__old_" in s]
        if rewrites and asides:
            os.rename(rewrites[0], live)
            for s in asides + rewrites[1:]:
                shutil.rmtree(s, ignore_errors=True)
        elif asides:
            os.rename(asides[0], live)
        elif rewrites:
            os.rename(rewrites[0], live)

    def _existing(self, part: str) -> DataFrame | None:
        self._recover(part)
        p = self._path(part)
        if not os.path.isdir(p):
            return None
        return self.spark.read.parquet(p)

    def _swap_in(
        self, part: str, df: DataFrame, nfiles: int | None = None
    ) -> None:
        """Replace ``part``'s live dataset with ``df`` via the
        materialize-to-temp + rename-aside swap (crash window healed by
        ``_recover``)."""
        path = self._path(part)
        out = df.repartition(nfiles) if nfiles else df
        tmp = f"{path}__rewrite_{uuid.uuid4().hex[:8]}"
        out.write.mode("overwrite").parquet(tmp)
        aside = f"{path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, aside)
        os.rename(tmp, path)
        shutil.rmtree(aside)

    # ---- sequences

    def _next_seq(self) -> int:
        """Monotonic batch sequence.  The commit markers are
        authoritative: every committed seq has a marker, pending seqs
        were pruned by ``_recover_crashed`` before this runs, so
        max(marker)+1 needs no Spark job.  Legacy pre-marker state
        falls back to a one-time scan of every dataset; markers take
        over from the next fold."""
        if self._seq is None:
            highest = -1
            try:
                for n in os.listdir(self._commits_dir()):
                    if not n.endswith(".pending"):
                        highest = max(highest, int(n))
            except (FileNotFoundError, ValueError):
                highest = -1
            if highest < 0:
                # legacy state, or a legacy state whose first marker-era
                # fold crashed and was pruned: an empty marker set must
                # not alias legacy rows' seqs — scan the datasets once
                for part in self.PARTS:
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

    # ---- compaction

    def _compact_df(self, part: str, df: DataFrame) -> DataFrame:
        """Hook: transform ``part``'s rows during a maintain rewrite
        (e.g. merge log-structured partials).  Default: identity."""
        return df

    def maintain(self, target_files: int = 8) -> dict[str, int]:
        """Bound the per-batch file litter: rewrite any dataset holding
        more part-files than ``target_files`` (plus one in-flight batch
        of slack) down to ``target_files`` via the rename-aside swap.
        No retention knob: the state IS the fold memory — aging rows
        out silently corrupts future folds."""
        self._recover_crashed()
        out: dict[str, int] = {}
        for part in self.PARTS:
            df = self._existing(part)
            path = self._path(part)
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
            self._swap_in(part, self._compact_df(part, df), target_files)
            out[part] = target_files
        return out


__all__ = ["FoldStateIndex"]
