"""Store maintenance jobs: compaction, retention trim, type-widening.

The reference keeps its store healthy with (a) Redis ``XTRIM`` retention on
the ingest buffer (``src/stockops/data/database/writer.py:35-37,293-297``)
and (b) an opportunistic table rebuild when a previously-untyped column's
true affinity is learned (``src/stockops/data/database/sql_db.py:69-173``,
``_migrate_table_schema``).  A parquet store accumulates the analogous debt
differently — streaming ``foreachBatch`` appends one small file set per
micro-batch per partition — so the Spark-first maintenance surface is:

- :func:`compact`      — coalesce small files per Hive partition to a
  target size, preserving the (ticker, ts) row-group clustering.  One
  distributed job with dynamic partition overwrite; no driver data loop.
- :func:`retain`       — drop partitions older than an exchange-local
  date bound (the XTRIM analog).  Pure metadata: directory deletes, no
  data job at all.
- :func:`widen_types`  — detect files whose physical column types
  conflict (the NONE→REAL / int-then-float case that breaks a
  ``mergeSchema`` read) and cast-rewrite ONLY those files to the widened
  type, in place, distributed over executors.

Scale posture: compaction touches each byte once (read + write) and only
the partitions asked for; retention touches zero data bytes; widening
touches only the minority files that disagree with the widened schema —
at 100 TB none of these ever rewrites the whole store.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from stock_ops_spark import schemas as S
from stock_ops_spark.sources.layout import PARTITION_COLS, partition_values_predicate

_DEFAULT_TARGET_BYTES = 128 << 20  # one HDFS-ish block per output file


def _data_files(path: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return out


def _partition_dirs(root: str, parts: list[str]) -> list[tuple[str, dict[str, int]]]:
    """[(dir, {col: value})] for every leaf Hive partition directory."""
    found = []

    def walk(d: str, depth: int, vals: dict[str, int]):
        if depth == len(parts):
            found.append((d, dict(vals)))
            return
        col = parts[depth]
        for name in sorted(os.listdir(d)):
            if name.startswith(f"{col}="):
                vals[col] = int(name.split("=", 1)[1])
                walk(os.path.join(d, name), depth + 1, vals)
                del vals[col]

    if os.path.exists(root):
        walk(root, 0, {})
    return found


# ---------------------------------------------------------------------------
# Compaction
# ---------------------------------------------------------------------------


def compact(store, mode: str, target_file_bytes: int = _DEFAULT_TARGET_BYTES) -> dict:
    """Coalesce littered Hive partitions to ~size/target files each.

    Litter-aware: a partition is selected only when its file count
    exceeds what its byte size warrants (ceil(bytes/target) — plus slack
    for one in-flight micro-batch), so steady-state partitions that were
    already compacted are never re-read.  At 100 TB this is the
    difference between a bounded nightly job over the day's hot
    partitions and a full-store rewrite.

    One distributed job over the selected partitions only: read (static
    partition pruning via the partition-column filter) → repartition on
    (partition cols, salt) so every output directory is written by a
    bounded number of tasks → ``sortWithinPartitions(ticker, ts)`` to
    restore the row-group clustering the reader's min/max pruning relies
    on → dynamic-partition overwrite, which replaces exactly the
    partitions that were read.  Returns
    {"files_before": n, "files_after": m, "partitions_compacted": k}.
    """
    path = store.data_path(mode)
    files = _data_files(path)
    if not files:
        return {"files_before": 0, "files_after": 0, "partitions_compacted": 0}
    parts = PARTITION_COLS[mode]
    ts_col = S.TS_COL[mode]
    spark = store.spark

    # pick only littered partitions: more files than their size warrants
    dirty: list[dict[str, int]] = []
    dirty_bytes = 0
    if parts:
        for d, vals in _partition_dirs(path, parts):
            pfiles = _data_files(d)
            size = sum(os.path.getsize(f) for f in pfiles)
            warranted = -(-size // target_file_bytes)  # ceil, ≥1
            if len(pfiles) > max(1, warranted):
                dirty.append(vals)
                dirty_bytes += size
        if not dirty:
            return {
                "files_before": len(files),
                "files_after": len(files),
                "partitions_compacted": 0,
            }
    else:
        dirty_bytes = sum(os.path.getsize(f) for f in files)
        warranted = -(-dirty_bytes // target_file_bytes)  # ceil, ≥1
        if len(files) <= max(1, warranted):
            # steady state: same litter check as the partitioned path —
            # never a full-store rewrite on an already-compacted dataset
            return {
                "files_before": len(files),
                "files_after": len(files),
                "partitions_compacted": 0,
            }

    files_per_part = max(1, round(dirty_bytes / max(1, len(dirty)) / target_file_bytes))

    df = spark.read.option("mergeSchema", "true").parquet(path)
    if parts:
        df = df.where(
            partition_values_predicate(parts, [tuple(v[c] for c in parts) for v in dirty])
        )
    # Sever lineage from the path we are about to overwrite (same hazard as
    # ingest_batch: writing to a read path invalidates plan caches mid-job).
    df = df.localCheckpoint(eager=True)

    salt = F.pmod(F.xxhash64("ticker"), F.lit(files_per_part)).alias("__salt")
    if parts:
        repartitioned = df.repartition(*[F.col(c) for c in parts], salt)
    else:
        repartitioned = df.repartition(files_per_part, salt)
    # partition-column prefix (r12, §6): the V1 writer requires task rows
    # ordered by the dynamic-partition columns and would re-sort (and
    # de-cluster) a (ticker, ts)-only order — see cluster_for_write
    clustered = repartitioned.sortWithinPartitions(*parts, "ticker", ts_col)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer = clustered.write.mode("overwrite").option("compression", "zstd")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "files_before": len(files),
        "files_after": len(_data_files(path)),
        "partitions_compacted": len(dirty) if parts else 1,
    }


# ---------------------------------------------------------------------------
# Retention (XTRIM analog)
# ---------------------------------------------------------------------------


def retain(store, mode: str, keep_from: tuple) -> list[str]:
    """Delete partitions strictly older than ``keep_from`` (exchange-local
    (year,), (year, month) or (year, month, day) per the mode's grain).

    Metadata-only: compares the Hive partition tuple and removes whole
    directories — zero data bytes read.  Returns deleted directory paths.
    Raises for the unpartitioned interday mode (use a filtered rewrite —
    deleting by row there is a data job by construction).
    """
    import shutil

    parts = PARTITION_COLS[mode]
    if not parts:
        raise ValueError(f"mode {mode!r} is unpartitioned; retention needs a rewrite")
    bound = tuple(keep_from)
    if len(bound) > len(parts):
        raise ValueError(f"bound {bound} deeper than partition grain {parts}")
    deleted = []
    for d, vals in _partition_dirs(store.data_path(mode), parts):
        tup = tuple(vals[c] for c in parts)[: len(bound)]
        if tup < bound:
            shutil.rmtree(d)
            deleted.append(d)
    # prune now-empty intermediate dirs (year=Y left empty after its months go)
    root = store.data_path(mode)
    for dirpath, dirs, files in sorted(os.walk(root), key=lambda t: -len(t[0])):
        if dirpath != root and not dirs and not files:
            os.rmdir(dirpath)
    return deleted


# ---------------------------------------------------------------------------
# Type-widening migration
# ---------------------------------------------------------------------------

_WIDEN_ORDER = {
    "null": 0,
    "bool": 1,
    "int8": 2,
    "int16": 3,
    "int32": 4,
    "int64": 5,
    "float": 6,
    "double": 7,
}


def _widened(types: set[str]) -> str:
    """Widest type of a conflicting set, along the numeric affinity chain
    (the reference's NONE→INTEGER→REAL ladder, sql_db.py:69-173)."""
    known = [t for t in types if t in _WIDEN_ORDER]
    if len(known) != len(types):
        bad = types - set(_WIDEN_ORDER)
        raise TypeError(f"cannot widen non-numeric type conflict: {sorted(types)} ({bad})")
    top = max(known, key=_WIDEN_ORDER.__getitem__)
    # integer + float32 must widen past float32: float can't hold all int64
    if top == "float" and any(t.startswith("int") for t in known):
        return "double"
    return top


def scan_type_conflicts(store, mode: str) -> dict[str, dict]:
    """Per-column physical types across all files of the dataset, flagging
    columns whose files disagree.  Footer-only reads (pyarrow), no data IO.
    Returns {col: {"types": {...}, "widened": t, "files": [paths needing rewrite]}}.
    """
    import pyarrow.parquet as pq

    per_col: dict[str, dict[str, list[str]]] = {}
    for f in _data_files(store.data_path(mode)):
        schema = pq.read_schema(f)
        for name, typ in zip(schema.names, schema.types):
            per_col.setdefault(name, {}).setdefault(str(typ), []).append(f)
    out = {}
    for col, by_type in per_col.items():
        if len(by_type) <= 1:
            continue
        widened = _widened(set(by_type))
        need = sorted(p for t, ps in by_type.items() if t != widened for p in ps)
        out[col] = {"types": set(by_type), "widened": widened, "files": need}
    return out


def widen_types(store, mode: str) -> dict:
    """Cast-rewrite only the files whose physical types sit below the
    widened type, so a subsequent ``mergeSchema`` read succeeds.

    Distributed: the per-file rewrite (pyarrow read→cast→atomic replace)
    runs as Spark tasks over the file list — the driver touches metadata
    only.  Row order inside each file is preserved, so the (ticker, ts)
    clustering and therefore row-group pruning survive the migration.
    Returns {"columns": {col: widened}, "files_rewritten": n}.
    """
    conflicts = scan_type_conflicts(store, mode)
    if not conflicts:
        return {"columns": {}, "files_rewritten": 0}

    # file → {col: widened arrow type string}
    plans: dict[str, dict[str, str]] = {}
    for col, info in conflicts.items():
        for f in info["files"]:
            plans.setdefault(f, {})[col] = info["widened"]

    def rewrite(item):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        path, casts = item
        arrow = {
            "bool": pa.bool_(),
            "int8": pa.int8(),
            "int16": pa.int16(),
            "int32": pa.int32(),
            "int64": pa.int64(),
            "float": pa.float32(),
            "double": pa.float64(),
        }
        spark_type = {
            "bool": "boolean",
            "int8": "byte",
            "int16": "short",
            "int32": "integer",
            "int64": "long",
            "float": "float",
            "double": "double",
        }
        table = pq.read_table(path)
        fields = [
            f.with_type(arrow[casts[f.name]]) if f.name in casts else f
            for f in table.schema
        ]
        # Spark trusts its own schema stashed in the footer key-value
        # metadata over the physical parquet types — rewrite it too, or the
        # mergeSchema read keeps seeing the old type.
        meta = dict(table.schema.metadata or {})
        key = b"org.apache.spark.sql.parquet.row.metadata"
        if key in meta:
            row_md = json.loads(meta[key])
            for fld in row_md.get("fields", []):
                if fld.get("name") in casts:
                    fld["type"] = spark_type[casts[fld["name"]]]
            meta[key] = json.dumps(row_md).encode()
        table = table.cast(pa.schema(fields, metadata=meta))
        tmp = f"{path}.widen-{uuid.uuid4().hex[:8]}.tmp"
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)  # atomic per file
        # drop the stale Hadoop checksum sidecar (local fs): content changed
        crc = os.path.join(os.path.dirname(path), f".{os.path.basename(path)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        return path

    sc = store.spark.sparkContext
    done = sc.parallelize(list(plans.items()), max(1, len(plans))).map(rewrite).collect()
    # in-place content change: invalidate cached file statuses / schemas
    store.spark.catalog.refreshByPath(store.data_path(mode))
    return {
        "columns": {c: i["widened"] for c, i in conflicts.items()},
        "files_rewritten": len(done),
    }
