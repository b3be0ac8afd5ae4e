"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet directory, then compares row count, column
names, and an order-insensitive value hash.  Use while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def canon(df) -> tuple[int, list[str], str]:
    """pandas DataFrame → (rowcount, sorted cols, order-insensitive hash)."""
    import hashlib

    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to strings; floats via repr of rounded value
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "<null>"
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), sorted(df.columns), h


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from stock_ops_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ROWS  {name}: {len(sp)} rows (no oracle) [{t1-t0:.1f}s]")
            continue
        try:
            du = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ns, cs, hs = canon(sp)
        nd, cd, hd = canon(du)
        ok = (ns, cs, hs) == (nd, cd, hd)
        status = "OK   " if ok else "FAIL "
        print(f"{status}{name}: spark {ns} rows / duck {nd} rows [{t1-t0:.1f}s]")
        if not ok:
            failures.append(name)
            if cs != cd:
                print(f"      cols spark={cs} duck={cd}")
            elif ns == nd:
                merged = sp.reindex(sorted(sp.columns), axis=1)
                print("      value mismatch; sample spark:")
                print(merged.head(3).to_string())
                dd = du.reindex(sorted(du.columns), axis=1)
                print("      sample duck:")
                print(dd.head(3).to_string())
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
