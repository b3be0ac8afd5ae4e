"""Raw text-corpus ingestion: JSONL with schema enforcement, corrupt-
record quarantine, and ingest-time hygiene.

The corpora an LLM data pipeline actually receives are newline-
delimited JSON dumps — billions of lines, a fraction of them broken
(truncated uploads, unescaped control characters, smashed-together
records).  Dropping them silently corrupts volume accounting; failing
the whole file on one bad line is worse.  This module reads PERMISSIVE
with an explicit schema (never inferSchema — at 100 TB schema inference
is a full extra pass over the data) and splits the result into:

- **good** — rows matching the declared schema, with required fields
  present;
- **quarantine** — the raw text of every rejected line plus a reason
  (``corrupt`` = not parseable as JSON at all, ``missing:<field>`` =
  parsed but violating the contract), written for replay/forensics
  instead of vanished.

Mechanics: ONE ``spark.read.text`` line scan, parsed with ``from_json``
carrying a corrupt-record field — the split is a codegen predicate on
that field, not a UDF, and both sides stay lazy.  (The naive
``spark.read.json`` + filter-on-``_corrupt_record`` design hits
Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction once column
pruning reduces the quarantine side to the corrupt column alone, and
its suggested workaround — cache the parse — is exactly what a 100 TB
ingest cannot do.  ``from_json`` over a text scan has no such
restriction and keeps the RAW line available for replay for free.)
The companion ``ingest_documents`` adds the hygiene the `documents`
table contract expects (doc_id from a content hash, n_chars) so a raw
dump becomes queryable by every documents-table operator in the
registry.

Reference parity: the reference validates provider JSON row-by-row in
Python before insert (src/stockops/data/transform.py); this is the
same reject-don't-crash contract executed as Spark predicates at scan
time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


@dataclass
class CorpusRead:
    """Result of a quarantining read: both sides stay DataFrames (lazy,
    distributed); nothing is counted or collected until the caller
    decides to."""

    good: DataFrame
    quarantine: DataFrame  # (raw, reason)


def _parse_and_split(
    lines: DataFrame, schema: T.StructType, required: list[str] | None
) -> CorpusRead:
    """Shared batch/stream splitter over a one-column line frame."""
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = lines.select(
        F.col("value").alias("raw"),
        F.from_json(
            "value",
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("rec"),
    )
    is_corrupt = F.col(f"rec.{CORRUPT_COL}").isNotNull()
    miss_terms = [
        F.when(F.col(f"rec.{c}").isNull(), F.lit(f"missing:{c}"))
        for c in (required or [])
    ]
    missing_reason = (
        F.concat_ws(",", *miss_terms) if miss_terms else F.lit("")
    )
    good = parsed.where(~is_corrupt)
    for c in required or []:
        good = good.where(F.col(f"rec.{c}").isNotNull())
    good = good.select(*[F.col(f"rec.{f.name}") for f in schema.fields])
    quarantine = (
        parsed.withColumn(
            "reason",
            F.when(is_corrupt, F.lit("corrupt")).otherwise(missing_reason),
        )
        .where(F.col("reason") != "")
        .select("raw", "reason")
    )
    return CorpusRead(good=good, quarantine=quarantine)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: list[str] | None = None,
) -> CorpusRead:
    """Schema-enforced JSONL read with quarantine instead of silent drop.

    ``schema`` is REQUIRED (no inference pass).  ``required`` lists
    fields that must be non-NULL for a row to count as good; everything
    else may be NULL (absent keys parse to NULL in PERMISSIVE mode and
    are a schema-evolution fact of raw dumps, not an error).
    """
    return _parse_and_split(spark.read.text(path), schema, required)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> CorpusRead:
    """Streaming twin of :func:`read_jsonl`: watch a directory of JSONL
    dumps and emit the same good/quarantine split per micro-batch —
    both sides are STREAMING DataFrames sharing one file source, so a
    caller typically writes them from a single ``foreachBatch`` (batch
    ingest + quarantine append in the same effectively-once commit,
    the `streaming/ingest.py` discipline).  ``max_files_per_trigger``
    is the backpressure knob for bursty drop-directories."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _parse_and_split(reader.text(path), schema, required)


def ingest_documents(
    spark: SparkSession,
    path: str,
    default_lang: str = "und",
    default_source: str = "unknown",
) -> CorpusRead:
    """Raw JSONL dump → rows matching the `documents` table contract.

    - ``doc_id``: xxhash64(text) — a CONTENT id, so byte-identical
      documents collide here and are removed by the exact-dedup pass,
      never double-counted.
    - ``lang`` / ``source``: defaulted, never NULL (the quality and
      routing operators group by them).
    - ``n_chars``: materialized once at ingest (the reference computes
      row stats at insert; same discipline).

    ``text`` is the one required field — a document without text is
    quarantined, not defaulted.
    """
    r = read_jsonl(spark, path, DOCUMENTS_SCHEMA, required=["text"])
    good = r.good.select(
        F.xxhash64(F.col("text")).alias("doc_id"),
        "text",
        F.coalesce(F.col("lang"), F.lit(default_lang)).alias("lang"),
        F.coalesce(F.col("source"), F.lit(default_source)).alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return CorpusRead(good=good, quarantine=r.quarantine)
