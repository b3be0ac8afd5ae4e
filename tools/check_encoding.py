#!/usr/bin/env python
"""Standalone encoding-drift canary (pytest twin: tests/test_encoding_canary.py).

Loads every table at the given scale factor and asserts that (a) any ``ts``
column resolves to plain TimestampType after ``catalog.load`` (never NTZ,
never a raw long), (b) epoch magnitudes land in 2015-2035, and (c) every
table's FULL post-load schema matches the expected-type manifest (catches
DATE/decimal/string drift on non-ts columns with the same
one-obvious-failure property).  Run after any driver/testdata refresh so a
physical-encoding change fails HERE, in one obvious place, instead of in 11
downstream operators (the round-3 incident).

Usage: python tools/check_encoding.py [sf_dir]
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
import pyspark.sql.types as T  # noqa: E402

from stock_ops_spark import catalog  # noqa: E402
from stock_ops_spark.session import get_spark  # noqa: E402

LO = datetime.datetime(2015, 1, 1)
HI = datetime.datetime(2035, 1, 1)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark("check_encoding", shuffle_partitions=8)
    bad = []
    for table in catalog.TABLES:
        path = catalog.table_path(sf_dir, table)
        if not os.path.exists(path):
            continue
        df = catalog.load(spark, sf_dir, table)
        got = ", ".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
        want = catalog.EXPECTED_SCHEMAS.get(table)
        if want is not None and got != want:
            bad.append(
                f"{table} full schema drifted:\n      expected {want}\n      got      {got}"
            )
        fields = {f.name: f.dataType for f in df.schema.fields}
        if "ts" not in fields:
            print(f"  {table}: no ts column, schema matches manifest (ok)")
            continue
        dt = fields["ts"]
        if not isinstance(dt, T.TimestampType):
            bad.append(f"{table}.ts is {dt} (want TimestampType)")
            continue
        row = df.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
        if row.lo is None or not (LO <= row.lo <= HI and LO <= row.hi <= HI):
            bad.append(
                f"{table}.ts range [{row.lo}, {row.hi}] outside 2015-2035 "
                "(unit mix-up at the read boundary?)"
            )
        else:
            print(f"  {table}: ts TimestampType, range [{row.lo} .. {row.hi}] OK")
    if bad:
        print("ENCODING CANARY FAILED:")
        for b in bad:
            print(f"  - {b}")
        return 1
    print(f"encoding canary green at {sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
