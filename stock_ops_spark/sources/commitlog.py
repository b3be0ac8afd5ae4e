"""Manifest commit log: the crash window plain parquet cannot close,
closed.

``ParquetStore`` is crash-safe except for ONE documented window (see
``operators/stats.StatsTable``): a kill after the data append but
before the stats merge leaves the catalog a batch behind, healed only
by a maintenance-time ``rebuild_stats``.  The root cause is structural
— data files and catalog state are two writes with no transaction
around them.  ``ManifestStore`` adds the transaction, the same way
Delta Lake / Iceberg do, reduced to what plain files can guarantee:

- every ingest writes its data to a FRESH batch directory
  (``batch-<uuid>/``, invisible to readers — nothing lists it);
- the cumulative stats parquet for the would-be version is written
  next, also invisible;
- then ONE atomic, put-if-absent commit file
  (``__log/<version>.json``) publishes {batch dirs, stats dirs}
  together.  ``os.link`` from a tmp name gives compare-and-swap on
  POSIX (rename would silently overwrite a racing writer's commit).

A SIGKILL anywhere leaves either no commit (data + stats dirs are
unreferenced orphans, swept by ``gc_orphans``; the streaming replay
re-ingests the batch) or a complete commit.  There is no torn state
and no stats lag — ``rebuild_stats`` becomes unnecessary here.

Concurrent writers get optimistic concurrency: the commit encodes the
expected version; on collision the loser recomputes its delta against
the refreshed state (its dedup/version assignment may genuinely change)
and retries.  Readers get snapshot isolation and TIME TRAVEL for free:
``read_all(mode, at_version=k)`` folds commits 1..k.

Compaction rewrites many batch dirs into one and publishes
removes+adds in a single commit — readers switch snapshots atomically;
the old dirs stay until GC, so in-flight readers finish correctly.

Reference parity: the reference's SQLite writer gets all of this from
SQLite's own journal (src/stockops/data/database/sql_db.py — one
process, one file, BEGIN..COMMIT); this module is the multi-writer,
multi-file distributed equivalent.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from stock_ops_spark import schemas as S
from stock_ops_spark.operators.stats import batch_stats, merge_stats
from stock_ops_spark.operators.versioning import latest_version_view
from stock_ops_spark.sources.ingest import (
    cluster_for_write,
    compute_versioned_delta,
)
from stock_ops_spark.sources.layout import PARTITION_COLS, mode_root


class CommitConflict(Exception):
    """Another writer published this version first; recompute and retry."""


class ManifestLog:
    """An append-only sequence of numbered JSON commits for one dataset."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def _path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:08d}.json")

    def version(self) -> int:
        """Highest committed version (0 = empty log)."""
        try:
            names = os.listdir(self.log_dir)
        except OSError:
            return 0
        best = 0
        for n in names:
            if n.endswith(".json") and n[:-5].isdigit():
                best = max(best, int(n[:-5]))
        return best

    def commits(self, upto: int | None = None) -> list[dict]:
        v = self.version() if upto is None else upto
        out = []
        for i in range(1, v + 1):
            with open(self._path(i)) as f:
                out.append(json.load(f))
        return out

    def state(self, at_version: int | None = None) -> dict:
        """Fold commits → {'version', 'dirs', 'stats'} where 'dirs' is
        the live batch-dir list and 'stats' the LATEST commit's stats
        pointer (stats are cumulative snapshots, not deltas)."""
        commits = self.commits(upto=at_version)
        dirs: list[str] = []
        stats = None
        for c in commits:
            for r in c.get("removes", []):
                if r in dirs:
                    dirs.remove(r)
            dirs.extend(c.get("adds", []))
            if "stats" in c:
                stats = c["stats"]
        return {"version": len(commits), "dirs": dirs, "stats": stats}

    def try_commit(self, version: int, payload: dict) -> None:
        """Put-if-absent publish of ``version``; raises CommitConflict
        if that version already exists (the POSIX compare-and-swap:
        ``os.link`` fails with EEXIST where rename would overwrite)."""
        os.makedirs(self.log_dir, exist_ok=True)
        final = self._path(version)
        tmp = f"{final}.{uuid.uuid4().hex[:8]}.tmp"
        doc = dict(payload, version=version)
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise CommitConflict(f"version {version} already committed") from None
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass


class ManifestStore:
    """``ParquetStore``'s ingest semantics under a manifest commit log.

    Same dedup/versioning/stats contract (shared helpers in
    ``sources/ingest.py``); different physical layout:

        <root>/<provider>/<exchange>/<mode>/batch-<uuid>/<hive parts>/
        <root>/<provider>/<exchange>/<mode>__log/NNNNNNNN.json
        <root>/<provider>/<exchange>/<mode>__log/stats-NNNNNNNN-<uuid>/

    Reads fold the manifest: each live batch dir is read with its own
    basePath (Spark refuses partition discovery across non-Hive
    intermediate dirs) and the union is by name with missing columns
    NULL-filled — the same evolution contract as mergeSchema.
    """

    MAX_COMMIT_RETRIES = 5

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        provider: str = "EODHD",
        exchange: str = "US",
        tz: str = "America/New_York",
        auto_compact_every: int = 16,
        observers: list | None = None,
    ):
        self.spark = spark
        self.root = root
        self.provider = provider
        self.exchange = exchange
        self.tz = tz
        # Same contract as ParquetStore.observers, with one OCC nuance:
        # observers fire only AFTER try_commit succeeds — a losing
        # attempt's delta was computed against a stale version and is
        # recomputed on retry, so folding it would double-count exactly
        # the rows the winner already committed.
        self.observers = list(observers or [])
        # Reads union one relation per live batch dir, so read (and the
        # ingest dedup probe, which reads) degrades linearly in commits
        # since the last compaction — measured 4x rows/s loss at 100
        # uncompacted micro-batches.  Folding every K commits bounds the
        # union at K relations, amortizing one rewrite across K ingests
        # (Delta's OPTIMIZE cadence).  0 disables.
        self.auto_compact_every = auto_compact_every

    # -- paths -----------------------------------------------------------
    def data_path(self, mode: str) -> str:
        return mode_root(self.root, mode, self.provider, self.exchange)

    def log(self, mode: str) -> ManifestLog:
        return ManifestLog(self.data_path(mode) + "__log")

    # -- read ------------------------------------------------------------
    def _read_dirs(self, mode: str, dirs: list[str]) -> DataFrame | None:
        if not dirs:
            return None
        frames = []
        for d in dirs:
            p = os.path.join(self.data_path(mode), d)
            frames.append(
                self.spark.read.option("mergeSchema", "true")
                .option("basePath", p)
                .parquet(p)
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def read_all(self, mode: str, at_version: int | None = None) -> DataFrame | None:
        """Current (or time-travel) snapshot.  Every dir it reads was
        published by a complete commit, so there is no torn-footer
        debris to tolerate — the reason ``ParquetStore.read_all`` needs
        an UNABLE_TO_INFER_SCHEMA escape and this does not."""
        state = self.log(mode).state(at_version)
        return self._read_dirs(mode, state["dirs"])

    def version(self, mode: str) -> int:
        return self.log(mode).version()

    def latest(self, mode: str) -> DataFrame | None:
        df = self.read_all(mode)
        if df is None:
            return None
        return latest_version_view(df, S.INDEX_COLS[mode])

    # -- stats (atomic with data — THE point) ------------------------------
    def _stats_state(self, mode: str, at_version: int | None = None):
        state = self.log(mode).state(at_version)
        return state["stats"]

    def _read_stats(self, mode: str, which: str, at_version: int | None = None):
        ptr = self._stats_state(mode, at_version)
        if not ptr or which not in ptr:
            return None
        p = os.path.join(self.log(mode).log_dir, ptr[which])
        return self.spark.read.parquet(p)

    def table_stats(self, mode: str) -> DataFrame | None:
        return self._read_stats(mode, "table")

    def interval_stats(self, mode: str) -> DataFrame | None:
        return self._read_stats(mode, "interval")

    # -- write -----------------------------------------------------------
    def ingest_batch(self, batch: DataFrame, mode: str) -> int:
        """Exactly ``ParquetStore.ingest_batch``'s contract, atomically.

        Optimistic concurrency: the delta is computed against version V
        and committed as V+1; if another writer got there first the
        dedup/version assignment may be stale, so the whole body re-runs
        against the fresh state (bounded retries)."""
        parts = PARTITION_COLS[mode]
        log = self.log(mode)
        for _attempt in range(self.MAX_COMMIT_RETRIES):
            state = log.state()
            existing = self._read_dirs(mode, state["dirs"])
            versioned = compute_versioned_delta(batch, existing, mode, self.tz)
            versioned = versioned.localCheckpoint(eager=True)
            n = versioned.count()
            if not n:
                return 0
            new_version = state["version"] + 1
            batch_dir = f"batch-{uuid.uuid4().hex[:12]}"
            writer = cluster_for_write(versioned, mode).write.option(
                "compression", "zstd"
            )
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(os.path.join(self.data_path(mode), batch_dir))

            stats_ptr = {}
            stats_dir = f"stats-{new_version:08d}-{uuid.uuid4().hex[:8]}"
            for which, by_interval in (("table", False), ("interval", True)):
                if by_interval and mode == "streaming":
                    continue
                keys = ["ticker", "interval"] if by_interval else ["ticker"]
                prior = self._read_stats(mode, which)
                merged = merge_stats(
                    prior, batch_stats(versioned, mode, by_interval), keys
                )
                rel = os.path.join(stats_dir, which)
                merged.coalesce(1).write.parquet(
                    os.path.join(log.log_dir, rel)
                )
                stats_ptr[which] = rel

            try:
                log.try_commit(
                    new_version,
                    {
                        "adds": [batch_dir],
                        "removes": [],
                        "stats": stats_ptr,
                        "ts": time.time(),
                    },
                )
                if (
                    self.auto_compact_every
                    and len(state["dirs"]) + 1 >= self.auto_compact_every
                ):
                    # best-effort fold; a lost race just means another
                    # writer compacted (or appended — next ingest retries)
                    try:
                        self.compact(mode)
                    except RuntimeError:
                        pass
                for obs in self.observers:
                    obs(versioned, mode)
                return n
            except CommitConflict:
                # loser cleans its own invisible output and recomputes
                shutil.rmtree(
                    os.path.join(self.data_path(mode), batch_dir),
                    ignore_errors=True,
                )
                shutil.rmtree(
                    os.path.join(log.log_dir, stats_dir), ignore_errors=True
                )
                continue
        raise RuntimeError(
            f"ingest lost {self.MAX_COMMIT_RETRIES} commit races on {mode}"
        )

    # -- maintenance -----------------------------------------------------
    def compact(self, mode: str) -> dict:
        """Rewrite all live batch dirs into one and swap atomically.
        Readers of the old snapshot keep working (old dirs survive
        until gc_orphans); new readers see one dir."""
        parts = PARTITION_COLS[mode]
        log = self.log(mode)
        for _attempt in range(self.MAX_COMMIT_RETRIES):
            state = log.state()
            if len(state["dirs"]) <= 1:
                return {"rewritten": 0, "dirs_before": len(state["dirs"])}
            df = self._read_dirs(mode, state["dirs"])
            new_dir = f"batch-{uuid.uuid4().hex[:12]}"
            writer = cluster_for_write(df, mode).write.option(
                "compression", "zstd"
            )
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(os.path.join(self.data_path(mode), new_dir))
            try:
                log.try_commit(
                    state["version"] + 1,
                    {
                        "adds": [new_dir],
                        "removes": list(state["dirs"]),
                        "stats": self._stats_state(mode),
                        "ts": time.time(),
                    },
                )
                return {
                    "rewritten": len(state["dirs"]),
                    "dirs_before": len(state["dirs"]),
                }
            except CommitConflict:
                shutil.rmtree(
                    os.path.join(self.data_path(mode), new_dir),
                    ignore_errors=True,
                )
                continue
        raise RuntimeError(f"compact lost {self.MAX_COMMIT_RETRIES} races")

    def gc_orphans(self, mode: str, grace_s: float = 3600.0) -> list[str]:
        """Remove batch/stats dirs referenced by NO commit (crash debris,
        commit-race losers) and batch dirs removed by compaction, once
        older than ``grace_s`` (in-flight writers and snapshot readers
        get that long to finish — at 100 TB set it above the longest
        expected job)."""
        log = self.log(mode)
        commits = log.commits()
        live = set(log.state()["dirs"])
        ever_stats = set()
        for c in commits:
            for rel in (c.get("stats") or {}).values():
                ever_stats.add(rel.split(os.sep)[0])
        # current stats must survive even past grace
        cur = self._stats_state(mode) or {}
        cur_stats = {rel.split(os.sep)[0] for rel in cur.values()}
        removed = []
        now = time.time()
        data_root = self.data_path(mode)
        try:
            names = os.listdir(data_root)
        except OSError:
            names = []
        for n in names:
            p = os.path.join(data_root, n)
            if not n.startswith("batch-") or not os.path.isdir(p):
                continue
            if n in live:
                continue
            if now - os.path.getmtime(p) < grace_s:
                continue
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
        try:
            lnames = os.listdir(log.log_dir)
        except OSError:
            lnames = []
        for n in lnames:
            p = os.path.join(log.log_dir, n)
            if not n.startswith("stats-") or not os.path.isdir(p):
                continue
            if n in cur_stats or n in ever_stats:
                continue  # current or referenced history (time travel): keep
            if now - os.path.getmtime(p) < grace_s:
                continue  # maybe an in-flight writer's pre-commit output
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
        return removed
