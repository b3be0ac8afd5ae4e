"""Ship the package to Python workers, whatever the driver's cwd.

Closures passed to ``mapInPandas`` / ``applyInPandas`` / pandas UDFs are
cloudpickled BY VALUE, but any module-level helper they reference
(``operators.heavyhitters._mg_update``, the multimodal codecs, the UDTF
class) is pickled BY REFERENCE — the executor-side Python worker must
``import stock_ops_spark`` to run the task.  Workers inherit neither the
driver's ``sys.path`` mutations nor its cwd, so a driver that imported
this package from a path insert (the grading-driver contract: it runs
``__spark_entry__`` from wherever IT lives) would strand every
Python-worker query with ``ModuleNotFoundError``.

``ensure_package_on_executors(spark)`` closes the gap: zip the package
once per source tree state (content key = newest .py mtime), publish
atomically to the uid-scoped tmp dir (same trust rationale as
``operators/artifacts.default_cache_dir``), ``sc.addPyFile`` it —
workers prepend the zip to their ``sys.path`` at task setup.  Idempotent
per SparkContext (flagged), a few ms after the first call, harmless when
workers could already import the package (same code either way).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_FLAG = "_stock_ops_spark_shipped"


def _package_dir() -> str:
    import stock_ops_spark

    return os.path.dirname(os.path.abspath(stock_ops_spark.__file__))


def _tree_key(pkg_dir: str) -> str:
    newest = 0
    count = 0
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                count += 1
                try:
                    newest = max(
                        newest, os.stat(os.path.join(root, f)).st_mtime_ns
                    )
                except OSError:
                    pass
    return f"{count}_{newest}"


def package_zip() -> str:
    """Build (or reuse) the package zip for this source-tree state and
    return its path.  Atomic publish: tmp name + rename."""
    import hashlib

    pkg_dir = _package_dir()
    uid = os.getuid() if hasattr(os, "getuid") else "na"
    loc = hashlib.sha1(pkg_dir.encode()).hexdigest()[:8]
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"stock_ops_spark_pkg_{uid}_{loc}_{_tree_key(pkg_dir)}.zip",
    )
    if os.path.exists(zpath):
        return zpath
    tmp = f"{zpath}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "stock_ops_spark", os.path.relpath(full, pkg_dir)
                )
                z.write(full, rel)
    try:
        os.rename(tmp, zpath)
    except OSError:
        try:
            os.remove(tmp)
        except OSError:
            pass
    return zpath


def ensure_package_on_executors(spark) -> None:
    """Idempotently make ``stock_ops_spark`` importable by this
    session's Python workers.  Called by every registry query wrapper
    and by ``session.get_spark`` — a few ms once, no-ops after."""
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    try:
        sc.addPyFile(package_zip())
    except Exception:
        # Best-effort: a repeated addPyFile of the same name (another
        # entry point beat us to it on this context) must not fail the
        # query that merely wanted to be safe.
        pass
    setattr(sc, _FLAG, True)
