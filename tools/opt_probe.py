"""Optimization probe: time a query (min-of-N .count(), bench methodology)
and dump its POST-EXECUTION final AQE plan (shows ReusedExchange).

    python tools/opt_probe.py [--sf DIR] [--n N] [--plan] q140_supplier_cosine ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = 3
    dump_plan = False
    out = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]; i += 2
        elif args[i] == "--n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--plan":
            dump_plan = True; i += 1
        else:
            out.append(args[i]); i += 1
    from stock_ops_spark import queries as Q
    from stock_ops_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("opt-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in out:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, sf).count()  # warmup: codegen + footers
        times = []
        for k in range(n):
            spark.sparkContext.setJobDescription(f"timed {name} #{k}")
            t0 = time.perf_counter()
            df = fn(spark, sf)
            df.count()
            times.append(time.perf_counter() - t0)
        import os as _os
        la = round(_os.getloadavg()[0], 2)
        print(f"{name}: min={min(times):.3f}s runs={[round(t,3) for t in times]} load={la}",
              flush=True)
        if dump_plan:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"/tmp/{name}_final_plan.txt"
            with open(path, "w") as f:
                f.write(plan)
            print(f"  final plan -> {path}")


if __name__ == "__main__":
    main()
