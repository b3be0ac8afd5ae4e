"""artifacts.gc: retention for the fit-once-read-many cache.

Artifact keys embed source mtime+size, so every corpus rewrite strands
the prior artifacts — gc() is the bound on that growth.  Pins: age
policy, per-family keep-latest policy, and that unknown layouts and
in-flight .tmp staging paths are never touched.
"""

from __future__ import annotations

import os
import time

from stock_ops_spark.operators import artifacts


def _mk_parquet_dir(root, name, age_s):
    p = os.path.join(root, name)
    os.makedirs(p)
    f = os.path.join(p, "part-00000.snappy.parquet")
    with open(f, "w") as fh:
        fh.write("x")
    old = time.time() - age_s
    os.utime(f, (old, old))
    os.utime(p, (old, old))
    return p


def _mk_json(root, name, age_s):
    p = os.path.join(root, name)
    with open(p, "w") as fh:
        fh.write("{}")
    old = time.time() - age_s
    os.utime(p, (old, old))
    return p


KEY_A = "a" * 20
KEY_B = "b" * 20
KEY_C = "c" * 20


def test_gc_noop_without_policy(tmp_path):
    root = str(tmp_path)
    _mk_parquet_dir(root, f"neardup_{KEY_A}.parquet", 10_000)
    assert artifacts.gc(root) == []
    assert os.listdir(root)


def test_gc_age_policy(tmp_path):
    root = str(tmp_path)
    old = _mk_parquet_dir(root, f"neardup_{KEY_A}.parquet", 10_000)
    fresh = _mk_parquet_dir(root, f"neardup_{KEY_B}.parquet", 10)
    old_json = _mk_json(root, f"kmeans_{KEY_C}.json", 10_000)
    removed = artifacts.gc(root, max_age_s=3_600)
    assert removed == sorted([old, old_json])
    assert os.path.isdir(fresh)


def test_gc_keep_latest_per_family(tmp_path):
    root = str(tmp_path)
    oldest = _mk_parquet_dir(root, f"containment_{KEY_A}.parquet", 3_000)
    mid = _mk_parquet_dir(root, f"containment_{KEY_B}.parquet", 2_000)
    newest = _mk_parquet_dir(root, f"containment_{KEY_C}.parquet", 1_000)
    other_family = _mk_parquet_dir(root, f"pagerank_{KEY_A}.parquet", 9_000)
    removed = artifacts.gc(root, keep_latest=1)
    # keep-latest is PER FAMILY: containment keeps its newest, pagerank
    # keeps its only entry despite being the globally oldest
    assert removed == sorted([oldest, mid])
    assert os.path.isdir(newest) and os.path.isdir(other_family)


def test_gc_never_touches_tmp_or_unknown(tmp_path):
    root = str(tmp_path)
    tmp_stage = _mk_parquet_dir(root, f"neardup_{KEY_A}.parquet.deadbeef.tmp", 99_999)
    unknown = _mk_json(root, "notes.json", 99_999)
    assert artifacts.gc(root, max_age_s=1, keep_latest=0) == []
    assert os.path.isdir(tmp_stage) and os.path.isfile(unknown)


def test_gc_parquet_dir_age_is_newest_file(tmp_path):
    """A dir whose directory mtime is old but whose data file is fresh
    must NOT be collected (a reader may have just been written into it
    by a racing rename)."""
    root = str(tmp_path)
    p = _mk_parquet_dir(root, f"neardup_{KEY_A}.parquet", 10_000)
    f = os.path.join(p, "part-00000.snappy.parquet")
    now = time.time()
    os.utime(f, (now, now))  # fresh file inside old-mtime dir
    assert artifacts.gc(root, max_age_s=3_600) == []
    assert os.path.isdir(p)


def test_gc_collects_suffixless_bucket_dirs(tmp_path):
    """Bucketed twins are versioned DIRECTORIES with no suffix — the
    keep-latest policy must see them as one family per (name, fam) and
    collect stranded versions, while never touching .tmp staging."""
    import os
    import time

    from stock_ops_spark.operators import artifacts

    cache = str(tmp_path)
    fam = "a" * 20
    old_v, new_v = "b" * 20, "c" * 20
    for ver, age in ((old_v, 100), (new_v, 0)):
        d = os.path.join(cache, f"bucket_orders_{fam}_{ver}")
        os.makedirs(d)
        with open(os.path.join(d, "part-0"), "w") as f:
            f.write("x")
        t = time.time() - age
        os.utime(os.path.join(d, "part-0"), (t, t))
        os.utime(d, (t, t))
    staging = os.path.join(cache, f"bucket_orders_{fam}_{old_v}.deadbeef.tmp")
    os.makedirs(staging)

    removed = artifacts.gc(cache, keep_latest=1)
    assert removed == [os.path.join(cache, f"bucket_orders_{fam}_{old_v}")]
    assert os.path.isdir(os.path.join(cache, f"bucket_orders_{fam}_{new_v}"))
    assert os.path.isdir(staging)  # in-flight staging never touched


def test_gc_never_touches_generation_markers(tmp_path):
    """The IVF quantizer-generation marker (r10) must survive every gc
    policy: collecting it would silently reset a refreshed family to
    generation 0 and resurrect the STALE pre-refresh quantizer on the
    next build."""
    from stock_ops_spark.operators.ivf import _generation, bump_generation

    cache = str(tmp_path)
    fam_base = "d" * 20
    assert bump_generation(cache, fam_base) == 1
    marker = os.path.join(cache, f"ivf_{fam_base}.generation")
    t = time.time() - 10_000
    os.utime(marker, (t, t))
    removed = artifacts.gc(cache, max_age_s=1, keep_latest=1)
    assert removed == []
    assert os.path.exists(marker)
    assert _generation(cache, fam_base) == 1
