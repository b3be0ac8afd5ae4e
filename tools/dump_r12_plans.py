"""Dump .explain("formatted") for named queries into plans/r12/.

    python tools/dump_r12_plans.py before q264_shingle_skew q140_supplier_cosine ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, sys.argv[1]); sys.argv.pop(1)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from stock_ops_spark import queries as Q
    from stock_ops_spark.session import get_spark

    spark = get_spark("plans-r12", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    outdir = "/root/repo/plans/r12"
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = Q.QUERIES[n](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{outdir}/{n}_{tag}.txt", "w") as f:
            f.write(f"# {n} — explain(formatted), {tag}, sf_dir={sf}\n")
            f.write(plan)
        print(n, "ok", len(plan))


if __name__ == "__main__":
    main()
