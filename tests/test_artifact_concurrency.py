"""Two PROCESSES build the same pair artifact at once — the rename-aside
publish path (operators/artifacts.py) must let one writer win, both
callers return correct pairs, and the surviving artifact must be
readable and complete.  The in-process tests cover key/version logic;
this is the cross-process race a real cluster hits when two jobs cold-
start the same corpus version simultaneously."""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from stock_ops_spark.session import get_spark
from stock_ops_spark.operators.dedup import minhash_near_dup_pairs_cached
from stock_ops_spark import catalog

spark = get_spark({app!r}, master="local[2]", shuffle_partitions=2)
d = catalog.load(spark, "/root/testdata/sf0.001", "documents")
pairs = minhash_near_dup_pairs_cached(
    d,
    source_path=catalog.table_path("/root/testdata/sf0.001", "documents"),
    id_col="doc_id",
    text_col="text",
    threshold=0.5,
    cache_dir={cache!r},
)
print("PAIRS", pairs.count(), flush=True)
"""


def test_concurrent_cold_builds_one_winner_both_correct(spark, tmp_path):
    cache = str(tmp_path / "cache")

    procs = []
    for i in range(2):
        scr = tmp_path / f"child{i}.py"
        scr.write_text(
            _CHILD.format(repo=REPO, app=f"race-{i}", cache=cache)
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(scr)],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
        )
    counts = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out
        counts.append(
            int([l for l in out.splitlines() if l.startswith("PAIRS")][0].split()[1])
        )
    # both racers computed the same pair set
    assert counts[0] == counts[1] and counts[0] > 0

    # the surviving artifact is readable, complete, and not duplicated:
    # no .tmp staging debris left behind, and exactly one version of
    # each artifact family on disk
    leftovers = [f for f in os.listdir(cache) if ".tmp" in f]
    assert leftovers == []
    pair_dirs = [
        f for f in os.listdir(cache)
        if f.startswith("neardup_") and f.endswith(".pairs.parquet")
    ]
    assert len(pair_dirs) == 1
    got = spark.read.parquet(os.path.join(cache, pair_dirs[0])).count()
    assert got == counts[0]

    # a third (in-process) caller hits the warm path and agrees
    from stock_ops_spark import catalog
    from stock_ops_spark.operators.dedup import minhash_near_dup_pairs_cached

    d = catalog.load(spark, "/root/testdata/sf0.001", "documents")
    again = minhash_near_dup_pairs_cached(
        d,
        source_path=catalog.table_path("/root/testdata/sf0.001", "documents"),
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        cache_dir=cache,
    ).count()
    assert again == counts[0]
