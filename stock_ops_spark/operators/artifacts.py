"""Shared plumbing for persisted model/pipeline artifacts
(fit-once-read-many: k-means centroids, minhash near-dup pairs,
PageRank ranks).

One discipline, three users:

- **cache dir** — ``$SPARK_GRAFT_MODEL_CACHE`` if set, else a
  per-user tmpdir subdirectory (uid in the name, created 0o700).  A
  fixed world-readable path would let any local user pre-create the
  directory and poison cached artifacts that are read back without
  validation; scoping by uid removes the shared-namespace attack at
  zero cost.
- **cache key** — source file identity (abspath+mtime+size) + every
  pipeline parameter + an algorithm version tag.  A rewritten source
  invalidates automatically; a semantics change must bump the v-tag in
  the caller.
- **atomic publish** — callers write to a tmp name and rename, so
  concurrent fitters race benignly and a crash never leaves a
  half-written artifact at the final path.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def default_cache_dir() -> str:
    """Resolve the artifact cache dir and ensure it exists.

    ``$SPARK_GRAFT_MODEL_CACHE`` (explicit user choice) wins; otherwise
    a uid-scoped tmpdir subdirectory created with mode 0o700.
    """
    explicit = os.environ.get("SPARK_GRAFT_MODEL_CACHE")
    if explicit:
        os.makedirs(explicit, exist_ok=True)
        return explicit
    uid = os.getuid() if hasattr(os, "getuid") else "na"
    path = os.path.join(tempfile.gettempdir(), f"stock_ops_spark_models_{uid}")
    os.makedirs(path, mode=0o700, exist_ok=True)
    try:  # makedirs mode is umask-filtered and skipped for existing dirs
        os.chmod(path, 0o700)
    except OSError:
        pass
    return path


def source_identity(source_path: str) -> str:
    """File identity for the cache key: abspath+mtime+size when statable
    (single file), abspath alone for multi-file datasets."""
    try:
        st = os.stat(source_path)
        return f"{os.path.abspath(source_path)}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        return os.path.abspath(source_path)


def cache_key(raw: str) -> str:
    """Stable short digest of the full (v-tag|identity|params) string."""
    return hashlib.sha1(raw.encode()).hexdigest()[:20]


def gc(
    cache_dir: str | None = None,
    max_age_s: float | None = None,
    keep_latest: int | None = None,
) -> list[str]:
    """Retention sweep for the artifact cache — the maintenance half of
    the fit-once-read-many discipline.  Artifact keys embed the source
    file identity (mtime+size), so every corpus rewrite strands the
    previous version's artifacts forever; without a sweep the cache dir
    grows monotonically (same failure mode the streaming dedup index had
    before ``maintain()``).

    Policies (combinable; both None = no-op):
    - ``max_age_s``: remove artifacts whose newest contained file is
      older than this many seconds.
    - ``keep_latest``: per artifact FAMILY (the ``<name>_`` prefix before
      the key digest: neardup/containment/pagerank/kmeans), keep only
      the N most recently modified entries.

    In-flight ``*.tmp`` staging paths are never touched (a concurrent
    fitter owns them until its atomic rename).  Returns the removed
    paths.
    """
    import re
    import shutil
    import time as _time

    if cache_dir is None:
        cache_dir = default_cache_dir()
    pat = re.compile(r"^([a-z0-9]+)_[0-9a-f]{20}\.(parquet|json)$")
    entries: list[tuple[str, str, float]] = []  # (family, path, mtime)
    try:
        names = os.listdir(cache_dir)
    except OSError:
        return []
    for name in names:
        m = pat.match(name)
        if not m:
            continue  # unknown layout or .tmp staging path — leave it
        path = os.path.join(cache_dir, name)
        mtime = os.path.getmtime(path)
        if os.path.isdir(path):  # parquet dirs: age = newest part file
            for root, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        mtime = max(mtime, os.path.getmtime(os.path.join(root, f)))
                    except OSError:
                        pass
        entries.append((m.group(1), path, mtime))

    doomed: dict[str, None] = {}
    now = _time.time()
    if max_age_s is not None:
        for _fam, path, mtime in entries:
            if now - mtime > max_age_s:
                doomed[path] = None
    if keep_latest is not None:
        by_family: dict[str, list[tuple[float, str]]] = {}
        for fam, path, mtime in entries:
            by_family.setdefault(fam, []).append((mtime, path))
        for fam, items in by_family.items():
            items.sort(reverse=True)
            for _mtime, path in items[keep_latest:]:
                doomed[path] = None

    removed = []
    for path in doomed:
        try:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
            removed.append(path)
        except OSError:
            pass  # concurrent gc or permission oddity — skip, not fatal
    return sorted(removed)
