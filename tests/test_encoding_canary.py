"""Encoding-drift canary.

Round 3's entire regression was one silent change in the driver testdata's
physical timestamp encoding (TIMESTAMP(NANOS) → untagged TIMESTAMP(MICROS),
which Spark 4.1 reads as TIMESTAMP_NTZ): 11 components broke in 11 places.
This canary makes the NEXT format change fail in exactly one obvious spot:

1. every table's ``ts`` column must resolve to plain ``TimestampType``
   after ``catalog.load`` — never NTZ, never a raw long;
2. epoch magnitudes must land in [2015, 2035] — a unit mix-up (the q45
   silent-wrong: micros read as nanos shrinks timestamps 1000×) lands in
   1970 and fails loudly here;
3. ``normalize_ts`` itself must be a fixed point on every encoding it
   claims to handle (long s/ms/µs/ns, NTZ, TIMESTAMP).

``tools/check_encoding.py`` runs the same checks standalone.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from stock_ops_spark import catalog

SF = "/root/testdata/sf0.001"

LO = datetime.datetime(2015, 1, 1)
HI = datetime.datetime(2035, 1, 1)


def _ts_tables():
    import os

    out = []
    for t in catalog.TABLES:
        if os.path.exists(catalog.table_path(SF, t)):
            out.append(t)
    return out


@pytest.mark.parametrize("table", _ts_tables())
def test_ts_resolves_to_timestamp_in_sane_epoch_range(spark, table):
    df = catalog.load(spark, SF, table)
    ts_fields = [f for f in df.schema.fields if f.name == "ts"]
    if not ts_fields:
        return  # table has no event-time column
    assert isinstance(ts_fields[0].dataType, T.TimestampType), (
        f"{table}.ts resolved to {ts_fields[0].dataType} — the read boundary "
        "(catalog.normalize_ts) is not handling this file's encoding"
    )
    row = df.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    assert row.lo is not None
    assert LO <= row.lo <= HI and LO <= row.hi <= HI, (
        f"{table}.ts epoch range [{row.lo}, {row.hi}] outside 2015-2035 — "
        "unit mix-up at the read boundary (s/ms/µs/ns confusion)"
    )


# Full-width twin of the ts check above: every table's POST-load schema
# against catalog.EXPECTED_SCHEMAS (DATE/decimal/string drift on non-ts
# columns fails here with the same one-obvious-failure property).
SCHEMA_MANIFEST = catalog.EXPECTED_SCHEMAS


@pytest.mark.parametrize("table", sorted(SCHEMA_MANIFEST))
def test_full_schema_matches_manifest(spark, table):
    import os

    if not os.path.exists(catalog.table_path(SF, table)):
        pytest.skip(f"{table} absent from {SF}")
    df = catalog.load(spark, SF, table)
    got = ", ".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
    assert got == SCHEMA_MANIFEST[table], (
        f"{table} post-load schema drifted.\n  expected: {SCHEMA_MANIFEST[table]}\n"
        f"  got:      {got}\n"
        "Driver testdata encoding changed (the `ts` NANOS->NTZ event, wider). "
        "Normalize at the read boundary in catalog.py, then update this manifest."
    )


def test_load_handles_multi_file_tables(spark, tmp_path):
    """At 100 TB a table is a directory of many files, not one file —
    catalog.load must list, union and normalize them identically.  Also
    covers mixed layouts: Spark's reader handles per-file row groups; the
    ts normalization applies once to the unified schema."""
    src = catalog.load(spark, SF, "events")
    n = src.count()
    multi = str(tmp_path / "events.parquet")  # directory with table_path name
    src.repartition(8).write.parquet(multi)

    df = catalog.load(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.count() == n
    import glob

    assert len(glob.glob(f"{multi}/part-*.parquet")) >= 8


def test_normalize_ts_epoch_bands_property(spark):
    """Hypothesis sweep: ANY instant in the engine's supported range,
    encoded in any integer unit, normalizes to the same TimestampType
    value — the unit-band thresholds have no seams."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    LO_US = 1_420_070_400_000_000  # 2015-01-01
    HI_US = 2_051_222_400_000_000  # 2035-01-01

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(us=st.integers(min_value=LO_US, max_value=HI_US))
    def check(us):
        us -= us % 1_000_000  # whole seconds so every unit encodes exactly
        rows = [(us // 1_000_000, "s"), (us // 1_000, "ms"),
                (us, "us"), (us * 1_000, "ns")]
        df = spark.createDataFrame(rows, "ts long, unit string")
        out = catalog.normalize_ts(df).select("ts").distinct().collect()
        assert len(out) == 1
        got = out[0].ts
        assert got == datetime.datetime.utcfromtimestamp(us / 1_000_000)

    check()


def test_normalize_ts_is_unit_robust(spark):
    """One wall-clock instant encoded six ways must normalize to the SAME
    TimestampType value."""
    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in micros
    want = datetime.datetime(2023, 11, 14, 22, 13, 20)

    encodings = {
        "seconds": (base_us // 1_000_000, T.LongType()),
        "millis": (base_us // 1_000, T.LongType()),
        "micros": (base_us, T.LongType()),
        "nanos": (base_us * 1_000, T.LongType()),
    }
    for label, (val, dtype) in encodings.items():
        df = spark.createDataFrame([(val,)], T.StructType([T.StructField("ts", dtype)]))
        out = catalog.normalize_ts(df)
        assert isinstance(out.schema["ts"].dataType, T.TimestampType), label
        got = out.collect()[0].ts
        assert got == want, f"{label}: {got!r} != {want!r}"

    # NTZ → reinterpreted as UTC under the pinned-UTC session
    ntz = spark.createDataFrame(
        [(want,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    out = catalog.normalize_ts(ntz)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0].ts == want

    # TimestampType is a fixed point
    tst = spark.createDataFrame(
        [(want,)], T.StructType([T.StructField("ts", T.TimestampType())])
    )
    assert catalog.normalize_ts(tst).collect()[0].ts == want

    # DateType → midnight UTC
    dt_df = spark.createDataFrame(
        [(datetime.date(2023, 11, 14),)],
        T.StructType([T.StructField("ts", T.DateType())]),
    )
    out = catalog.normalize_ts(dt_df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0].ts == datetime.datetime(2023, 11, 14)

    # strings: ISO-8601 and digit-only epoch (any unit), mixed in one column;
    # surrounding columns and their ORDER must survive the rewrite
    strs = spark.createDataFrame(
        [(1, "2023-11-14 22:13:20", "a"), (2, "2023-11-14T22:13:20", "b"),
         (3, str(base_us), "c"), (4, str(base_us // 1_000_000), "d"),
         (5, None, "e"), (6, "not-a-timestamp", "f")],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.StringType()),
            T.StructField("tag", T.StringType()),
        ]),
    )
    out = catalog.normalize_ts(strs)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.columns == ["id", "ts", "tag"]  # order kept, no helper leakage
    got = [r.ts for r in out.orderBy("id").collect()]
    assert got[:4] == [want] * 4
    assert got[4] is None and got[5] is None  # junk nulls out, never throws
