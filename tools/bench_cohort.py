"""Time a named subset of registry queries at an arbitrary SF dir.

The r7 sf1 full-registry baseline (BENCH_SF1.json) surfaced a >10 s
cohort; this harness times just that cohort (or any --queries list) so
an optimization pass gets tight before/after numbers without a 10-min
full run.  Mirrors bench.py's session shape (same get_spark, same
timing discipline: .count() to materialize, wall-clock per query).

Usage:
  SPARK_DRIVER_MEMORY=48g python tools/bench_cohort.py \
      --sf-dir /root/repo/.scaledata/sf1.0 \
      --queries q264_shingle_skew q81_within_cluster_knn
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_COHORT = [
    "q264_shingle_skew",
    "q81_within_cluster_knn",
    "q234_editdist_neardup_docs",
    "q140_supplier_cosine",
    "q280_embedding_dim_correlation",
    "q93_decontamination",
    "q304_psi_distribution_drift",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scaledata/sf1.0")
    ap.add_argument("--queries", nargs="*", default=DEFAULT_COHORT)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    from stock_ops_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("bench_cohort", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    reg = entry.queries()
    out: dict[str, float] = {}
    for name in args.queries:
        fn = reg[name]
        best = None
        for _ in range(args.repeat):
            t0 = time.monotonic()
            n = fn(spark, args.sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]} s  ({n} rows)", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
