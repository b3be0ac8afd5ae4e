"""Every queries() entry hash-matches its DuckDB oracle at sf0.001 —
a fast local replica of the driver's correctness gate."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E
from stock_ops_spark import catalog

SF = "/root/testdata/sf0.001"


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None:
            return "<null>"
        try:
            if pd.isna(v):
                return "<null>"
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)

    rows = sorted(
        "\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return (
        len(df),
        sorted(df.columns),
        hashlib.md5("\x1e".join(rows).encode()).hexdigest(),
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = E.queries()[name]
    sp = fn(spark, SF).toPandas()
    oracle = E.oracle_sql().get(name)
    if oracle is None:
        assert len(sp) >= 0  # rows-only check
        return
    du = duck.execute(oracle).df()
    assert canon(sp) == canon(du)


def test_no_complex_output_columns(spark):
    """Driver-canonicalizer guard: no queries() entry may emit an
    Array/Map/Struct-typed column.  The driver hashes cell values; a
    complex cell is exactly the class of output that crashed q44 in
    round 1 (array percentiles) — the local canon() stringifies lists and
    would NOT catch it, so pin it at the schema level for every query.
    Schema-only: builds each plan, executes nothing."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    broken = {}
    for name, fn in sorted(E.queries().items()):
        # A builder that cannot even analyze must surface as ITS OWN entry,
        # not abort schema coverage of every other query (round-3 lesson:
        # one NTZ-broken plan hid the guard's results for 118 queries).
        try:
            schema = fn(spark, SF).schema
        except Exception as exc:  # noqa: BLE001 - report, don't mask
            broken[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            continue
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not broken, f"query builders failed analysis: {broken}"
    assert not bad, f"complex-typed output columns would break the driver: {bad}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["session_date", "open", "high", "low", "close", "n_trades"]
