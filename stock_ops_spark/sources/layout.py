"""Storage layout: Hive-partitioned Parquet replacing the reference's
date-named SQLite files.

Reference layout (``src/stockops/data/utils.py:47-76``): one ``.db`` file
per (data_type, provider, exchange[, year[, month[, day]]]) with one table
per ticker.  Here the same routing becomes partition *columns*, and ticker
becomes a plain (clustered) column — NOT a partition — because at 100 TB a
10k-ticker × date partition matrix explodes the file count; per-ticker
pruning instead comes from parquet min/max column stats after sorting
within partitions (SURVEY §7.3.7).

Partition grain per mode (mirrors get_db_filename_for_date):
- historical_interday → (none)            [single dataset]
- historical_intraday → year, month       [of event time in exchange tz]
- streaming           → year, month, day
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_ops_spark.functions.timeutils import epoch_ms_to_local, epoch_s_to_local

PARTITION_COLS = {
    "historical_interday": [],
    "historical_intraday": ["year", "month"],
    "streaming": ["year", "month", "day"],
}

MODES = tuple(PARTITION_COLS)


def mode_root(root: str, mode: str, provider: str, exchange: str) -> str:
    """Dataset root for one (mode, provider, exchange)."""
    return os.path.join(root, f"mode={mode}", f"provider={provider}", f"exchange={exchange}")


def _local_event_time(df: DataFrame, mode: str, tz: str) -> Column:
    if mode == "historical_interday":
        return F.col("date").cast("timestamp")
    if mode == "historical_intraday":
        return epoch_s_to_local(F.col("timestamp_UTC_s"), tz)
    if mode == "streaming":
        return epoch_ms_to_local(F.col("timestamp_UTC_ms"), tz)
    raise ValueError(f"unknown mode {mode!r}")


def with_partition_cols(df: DataFrame, mode: str, tz: str) -> DataFrame:
    """A2 event-time partition routing: derive (year[, month[, day]]) from
    the event timestamp converted to exchange-local time, so late rows land
    in their correct historical partition (never watermark-dropped)."""
    parts = PARTITION_COLS[mode]
    if not parts:
        return df
    local = _local_event_time(df, mode, tz)
    out = df
    if "year" in parts:
        out = out.withColumn("year", F.year(local))
    if "month" in parts:
        out = out.withColumn("month", F.month(local))
    if "day" in parts:
        out = out.withColumn("day", F.dayofmonth(local))
    return out


def partition_values_predicate(parts: list[str], tuples) -> "Column | None":
    """OR-of-conjunctions over literal partition tuples — reaches the file
    listing as static partition pruning.  Shared by the ingest dedup
    probe and maintenance compaction.  Returns None for an empty list."""
    pred = None
    for t in tuples:
        conj = None
        for c, v in zip(parts, t):
            term = F.col(c) == F.lit(v)
            conj = term if conj is None else (conj & term)
        pred = conj if pred is None else (pred | conj)
    return pred


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (z-order) interleave of the low ``bits`` bits of two
    non-negative integer columns: result bit 2i carries bit i of ``a``,
    bit 2i+1 carries bit i of ``b``.

    Purpose: multi-dimensional file skipping.  Sorting a table by ONE
    column gives parquet min/max pruning on that column only; sorting by
    the z-key keeps each file's span narrow in BOTH dimensions, so range
    predicates on either column (or both) prune files.  This is the
    standard space-filling-curve clustering (Delta/Iceberg OPTIMIZE
    ZORDER) expressed as a plain codegen column — no UDF, usable with
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` at any scale.

    All arithmetic is 64-bit (``bits`` ≤ 31 keeps the result positive);
    expressions unroll to shift/and/or chains inside whole-stage codegen.
    """
    z: Column = F.lit(0).cast("long")
    al = a.cast("long")
    bl = b.cast("long")
    for i in range(bits):
        abit = F.shiftright(al, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bl, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def cluster_by_zorder(
    df: DataFrame, col_a: str, col_b: str, n_files: int, bits: int = 16
) -> DataFrame:
    """Range-partition ``df`` into ``n_files`` z-contiguous slices and
    sort within each — the write-side clustering pass that makes
    parquet min/max stats selective on both columns."""
    zk = zorder_key(F.col(col_a), F.col(col_b), bits=bits)
    return (
        df.withColumn("__zkey", zk)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
