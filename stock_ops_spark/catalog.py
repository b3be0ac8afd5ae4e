"""Table catalog over a scale-factor directory of parquet files.

The driver testdata layout is one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md).  At 100 TB the same
code works unchanged over a directory tree of many files per table —
``spark.read.parquet`` handles multi-file listing, partition discovery and
pruning natively (this replaces the reference's hand-rolled filename
enumeration, reference ``src/stockops/data/utils.py:79-99``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Expected POST-``load`` logical schema per table — the read boundary's
# full-width contract.  The same writer freedom that silently flipped `ts`
# NANOS→NTZ (the round-3 incident) exists for dates (DATE vs TIMESTAMP vs
# string) and money columns (decimal vs double); the encoding canary
# (tests/test_encoding_canary.py, tools/check_encoding.py) asserts every
# table against this manifest so ANY drift fails in one obvious place.  A
# legitimate drift is handled by normalizing in ``load`` and updating this
# manifest — never by per-query patches.
EXPECTED_SCHEMAS = {
    "region": "r_regionkey:int, r_name:string",
    "nation": "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer": "c_custkey:bigint, c_name:string, c_nationkey:int, "
                "c_acctbal:double, c_mktsegment:string",
    "supplier": "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part": "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, "
            "p_size:int, p_retailprice:double",
    "orders": "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, "
              "o_totalprice:double, o_orderdate:timestamp, o_orderpriority:string",
    "lineitem": "l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, "
                "l_linenumber:int, l_quantity:double, l_extendedprice:double, "
                "l_discount:double, l_tax:double, l_returnflag:string, "
                "l_linestatus:string, l_shipdate:timestamp",
    "events": "event_id:bigint, ts:timestamp, user_id:bigint, "
              "event_type:string, value:double, props:string",
    "documents": "doc_id:bigint, text:string, lang:string, source:string, "
                 "n_chars:bigint",
    "embeddings": "vec_id:bigint, embedding:array<float>, label:int",
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize ``col`` to a plain ``TimestampType`` whatever the physical
    encoding was.

    At 100 TB you do not control your writers' parquet annotations; the
    encodings this engine has actually met in the wild:

    - ``TIMESTAMP(NANOS)`` read as long via ``nanosAsLong`` (old testdata)
    - ``TIMESTAMP(MICROS)`` with no tz annotation → Spark 4.1 infers
      ``TIMESTAMP_NTZ`` (current testdata)
    - tz-tagged micros → already ``TimestampType``
    - raw epoch integers in s/ms/µs/ns (provider payloads)

    Downstream code sees exactly ONE type.  This is the Spark twin of the
    reference's magnitude-based ``normalize_ts_to_seconds``
    (reference ``src/stockops/data/utils.py:102-121``) — the reference
    normalizes per value at the edge for the same reason.

    Integer unit detection is per-row magnitude CASE (pure JVM codegen):
    |v| ≥ 1e17 → nanos, ≥ 1e14 → micros, ≥ 1e11 → millis, else seconds
    (epoch-2020 is 1.6e9 s / 1.6e12 ms / 1.6e15 µs / 1.6e18 ns, so the
    bands are unambiguous for any date between 1973 and 5138).  Division
    stays in long arithmetic — float division rounds for epoch-ns values
    above 2^53, off-by-1µs vs the DuckDB oracle.
    """
    try:
        dt = df.schema[col].dataType
    except Exception:
        return df
    if isinstance(dt, T.TimestampType):
        return df
    c = F.col(col)
    if isinstance(dt, (T.TimestampNTZType, T.DateType)):
        # Session tz is pinned UTC (session.py), so this is a pure
        # reinterpretation of the stored wall-clock as UTC — no shift
        # (dates land on midnight UTC).
        return df.withColumn(col, F.to_timestamp(c))
    if isinstance(dt, (T.LongType, T.IntegerType)):
        micros = (
            F.when(F.abs(c) >= F.lit(10**17), F.expr(f"`{col}` DIV 1000"))
            .when(F.abs(c) >= F.lit(10**14), c)
            .when(F.abs(c) >= F.lit(10**11), c * F.lit(1000))
            .otherwise(c * F.lit(1_000_000))
        )
        return df.withColumn(col, F.timestamp_micros(micros))
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        # fractional epoch seconds (provider payloads) — micros precision
        return df.withColumn(
            col, F.timestamp_micros((c * F.lit(1_000_000)).cast("long"))
        )
    if isinstance(dt, T.StringType):
        # ISO-8601 strings (CSV/JSON-shaped feeds); digit-only strings are
        # epoch integers — recurse through the long branch for unit bands.
        # try_* variants: a malformed row nulls out instead of throwing
        # under ANSI mode — at 100 TB one junk string must not kill the
        # job (the canary's epoch-range check still surfaces systemic rot)
        digits = c.rlike(r"^-?\d+$")
        parsed = F.try_to_timestamp(F.when(~digits, c))
        as_long = F.when(digits, c).try_cast("long")
        tmp = df.withColumn("__ts_long", as_long).withColumn(col, parsed)
        tmp = normalize_ts(tmp.withColumnRenamed(col, "__ts_iso")
                           .withColumnRenamed("__ts_long", col))
        tmp = tmp.withColumn(
            col, F.coalesce(F.col(col), F.col("__ts_iso"))
        ).drop("__ts_iso")
        return tmp.select(*df.columns)  # renames appended ts — restore order
    return df


def _reader_confs(spark: SparkSession) -> None:
    """Runtime read confs so a VANILLA (driver) session resolves the same
    types as ours: nanos-annotated files read as long (then rebuilt by
    ``normalize_ts``), untagged-micros files read natively as
    ``TimestampType`` instead of NTZ.  Native typing keeps the scan free
    of any rebuild expression, so every ts predicate shape pushes down;
    ``normalize_ts`` stays as the belt-and-braces fallback for sessions
    where these confs are unavailable."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static on some builds
            pass


#: cache key → inferred StructType.  Schema inference on a parquet
#: path runs a footer-reading Spark job on EVERY ``spark.read.parquet``
#: call; a session that builds hundreds of queries over the same static
#: tables pays that job per table reference (r11 measurement: ~0.05-0.15 s
#: each, 1-5 per query).  Real catalogs (Hive/Iceberg/Delta) cache table
#: schemas as metadata for exactly this reason; this is the path-reader
#: twin.  Keyed by ``_schema_key`` so a rewritten/refreshed table
#: re-infers — results are never cached, only the schema (metadata).
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def _schema_key(path: str) -> tuple | None:
    """Invalidation key for the schema cache (VERDICT r11 #7): the old
    ``(path, st_mtime)`` key had 1-second granularity on some
    filesystems, so a same-second rewrite (or an in-place overwrite
    that preserves the directory entry set) could serve a stale schema.
    Now: ``st_mtime_ns`` + size for a file; for a directory,
    ``st_mtime_ns`` + a listing digest (sorted entry names + their
    sizes/mtime_ns), so any file added, removed or rewritten inside a
    dataset directory re-infers.  ``None`` (stat failed) disables
    caching for the call."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return (path, st.st_mtime_ns, st.st_size)
    try:
        entries = sorted(os.listdir(path))
        digest = hash(
            tuple(
                (n, s.st_size, s.st_mtime_ns)
                for n in entries
                for s in (os.stat(os.path.join(path, n)),)
            )
        )
    except OSError:
        return None
    return (path, st.st_mtime_ns, digest)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Column pruning + predicate pushdown reach the scan
    because we return the raw declarative reader output; the only rewrite
    is the ``ts`` read-boundary normalization (see ``normalize_ts``) —
    a no-op on the common path because ``_reader_confs`` already makes
    the scan produce ``TimestampType`` natively.
    """
    _reader_confs(spark)
    path = table_path(sf_dir, name)
    key = _schema_key(path)
    if key is not None:
        schema = _SCHEMA_CACHE.get(key)
        if schema is None:
            df = spark.read.parquet(path)
            _SCHEMA_CACHE[key] = df.schema
            return normalize_ts(df)
        return normalize_ts(spark.read.schema(schema).parquet(path))
    return normalize_ts(spark.read.parquet(path))


def stream_table(spark: SparkSession, sf_dir: str, name: str, stream_dir: str) -> DataFrame:
    """``readStream`` twin of ``load``: a file streaming source requires an
    explicit schema, so discover it from the actual parquet footer (never
    hardcode — the round-3 regression was exactly a hardcoded ``ts long``
    stream schema meeting micros data), then apply the same ``ts``
    normalization as the batch path.

    ``stream_dir`` is the directory the caller exposes the file(s) through
    (file streaming sources take directories); schema discovery reads the
    canonical table path.
    """
    _reader_confs(spark)
    path = table_path(sf_dir, name)
    key = _schema_key(path)
    schema = _SCHEMA_CACHE.get(key) if key is not None else None
    if schema is None:
        schema = spark.read.parquet(path).schema
        if key is not None:
            _SCHEMA_CACHE[key] = schema
    return normalize_ts(spark.readStream.schema(schema).parquet(stream_dir))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)
