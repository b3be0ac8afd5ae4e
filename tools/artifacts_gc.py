#!/usr/bin/env python
"""Retention sweep for the persisted-artifact cache.

The fit-once-read-many artifacts (minhash/containment pair sets, k-means
centroids, PageRank ranks — operators/artifacts.py) are keyed by source
file identity, so every corpus rewrite strands the previous artifacts;
this tool bounds that growth.

Usage:
    python tools/artifacts_gc.py                     # report only
    python tools/artifacts_gc.py --max-age-days 7    # age policy
    python tools/artifacts_gc.py --keep-latest 3     # per-family policy
    python tools/artifacts_gc.py --cache-dir /path ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_ops_spark.operators import artifacts  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--max-age-days", type=float, default=None)
    ap.add_argument("--keep-latest", type=int, default=None)
    args = ap.parse_args()
    cache_dir = args.cache_dir or artifacts.default_cache_dir()
    if args.max_age_days is None and args.keep_latest is None:
        entries = sorted(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else []
        print(f"{cache_dir}: {len(entries)} entries (report only; pass a policy)")
        for e in entries:
            print(f"  {e}")
        return 0
    removed = artifacts.gc(
        cache_dir,
        max_age_s=None if args.max_age_days is None else args.max_age_days * 86400,
        keep_latest=args.keep_latest,
    )
    print(f"removed {len(removed)} artifacts from {cache_dir}")
    for p in removed:
        print(f"  {p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
