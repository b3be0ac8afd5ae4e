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
