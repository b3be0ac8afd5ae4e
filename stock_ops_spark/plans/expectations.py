"""Declarative data-quality expectations — the maintenance-time QA
suite a 100 TB table runs before serving (dbt-test / Great-Expectations
shape, engine-native).

Each expectation compiles to a CONDITIONAL AGGREGATE column, and the
whole suite over one table executes as ONE aggregation pass — no
per-check scans (at 100 TB the difference between "QA is one pass" and
"QA is N passes" is the whole feature).  Uniqueness rides the same
aggregate as ``count(*) - count(distinct col)``; referential checks are
the one shape that genuinely needs a second input, and compile to an
anti-join AGGREGATED TO A SCALAR before it ever reaches the driver.

The report is a tall frame — (check, column, n_violations, n_checked,
passed) — produced by a stack() unpivot of the single aggregate row, so
it composes with the rest of the engine (thresholds, history tables,
alerting joins) instead of printing.

No reference twin: the reference validates required keys per row at
ingest (transform.py); a table-level QA suite is part of the
training-data extension surface (q262 is the oracled consumer).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: ``violated`` flags a bad row (NULL-safe);
    ``n_checked`` optionally narrows the denominator (default: all
    rows)."""

    name: str
    column: str
    violated: Column = field(compare=False)
    checked: Column | None = field(default=None, compare=False)


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", col, F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col})",
        col,
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )


def accepted_values(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(
        f"accepted_values({col})", col, c.isNull() | ~c.isin(*values)
    )


def matches_regex(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(
        f"matches_regex({col})", col, c.isNull() | ~c.rlike(pattern)
    )


def non_negative(col: str) -> Check:
    c = F.col(col)
    return Check(f"non_negative({col})", col, c.isNull() | (c < 0))


def satisfies(name: str, col: str, predicate: Column) -> Check:
    """Generic row expectation: ``predicate`` must hold (NULL counts as
    a violation — SQL three-valued logic would otherwise silently pass
    NULL rows)."""
    return Check(
        f"satisfies({name})", col, ~F.coalesce(predicate, F.lit(False))
    )


@dataclass(frozen=True)
class Unique:
    """Uniqueness rides the same single aggregate:
    violations = count(*) - count(distinct col) (NULLs count as
    violations of uniqueness only via the not_null check — pair them)."""

    column: str

    @property
    def name(self) -> str:
        return f"unique({self.column})"


@dataclass(frozen=True)
class ForeignKey:
    """Every non-null value of ``column`` must exist in ``ref[ref_col]``
    — compiled to an anti-join aggregated to ONE scalar row (the only
    expectation that needs a second input)."""

    column: str
    ref: DataFrame = field(compare=False)
    ref_col: str = "id"

    @property
    def name(self) -> str:
        return f"foreign_key({self.column})"


class ExpectationSuite:
    def __init__(self, checks: list):
        bad = [c for c in checks if not isinstance(c, (Check, Unique, ForeignKey))]
        if bad:
            raise TypeError(f"unknown expectation type in suite: {bad!r}")
        names = [c.name for c in checks]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate check names: {names}")
        self.row_checks = [c for c in checks if isinstance(c, Check)]
        self.uniques = [c for c in checks if isinstance(c, Unique)]
        self.fks = [c for c in checks if isinstance(c, ForeignKey)]
        if not (self.row_checks or self.uniques or self.fks):
            raise ValueError("expectation suite must contain at least one check")

    def report(self, df: DataFrame) -> DataFrame:
        """(check, column, n_violations, n_checked, passed) — one
        aggregation pass for all row checks + uniques; one scalar
        anti-join per foreign key."""
        frames = []
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(self.row_checks):
            denom = F.lit(1) if c.checked is None else c.checked.cast("int")
            aggs.append(
                F.sum(F.when(c.violated, 1).otherwise(0)).alias(f"__v{i}")
            )
            aggs.append(F.sum(denom).alias(f"__c{i}"))
        for j, u in enumerate(self.uniques):
            aggs.append(
                (
                    F.count(F.col(u.column))
                    - F.count_distinct(F.col(u.column))
                ).alias(f"__uv{j}")
            )
        one = df.agg(*aggs)

        # unpivot the single row into the tall report via stack()
        cells = []
        for i, c in enumerate(self.row_checks):
            cells.append(
                f"'{c.name}', '{c.column}', __v{i}, __c{i}"
            )
        for j, u in enumerate(self.uniques):
            cells.append(f"'{u.name}', '{u.column}', __uv{j}, __n")
        if cells:  # stack(0, ) is malformed SQL — an FK-only suite has none
            n = len(cells)
            frames.append(
                one.select(
                    F.expr(
                        f"stack({n}, {', '.join(cells)}) AS "
                        "(check_name, col_name, n_violations, n_checked)"
                    )
                )
            )

        for fk in self.fks:
            ref = fk.ref.select(F.col(fk.ref_col).alias(fk.column)).distinct()
            miss = (
                df.where(F.col(fk.column).isNotNull())
                .join(ref, fk.column, "left_anti")
                .agg(
                    F.lit(fk.name).alias("check_name"),
                    F.lit(fk.column).alias("col_name"),
                    F.count(F.lit(1)).alias("n_violations"),
                    F.count(F.lit(1)).alias("__ignored"),
                )
                .drop("__ignored")
            )
            checked = df.agg(
                F.sum(
                    F.when(F.col(fk.column).isNotNull(), 1).otherwise(0)
                ).alias("n_checked")
            )
            frames.append(miss.crossJoin(checked))

        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.select(
            "check_name",
            "col_name",
            F.col("n_violations").cast("bigint").alias("n_violations"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
            (F.col("n_violations") == 0).alias("passed"),
        ).orderBy("check_name")


def stream_report(
    stream: DataFrame,
    suite: "ExpectationSuite",
    history_path: str,
    checkpoint: str,
    available_now: bool = False,
    trigger_seconds: int = 10,
):
    """Streaming half of the suite: run the single-pass report on every
    micro-batch and APPEND it (plus batch_id) to a parquet history —
    the per-batch QA trail a streaming ingest publishes next to its
    data (alerting joins `history WHERE NOT passed`; a widening
    violation count per batch is the canary for an upstream schema or
    encoding drift, the failure mode the round-3 NTZ event taught).

    The report aggregate runs INSIDE foreachBatch on the already-
    materialized micro-batch — one extra aggregation per batch, no
    second source scan, and the history append is tiny (one row per
    check per batch)."""

    def write_report(batch: DataFrame, batch_id: int) -> None:
        rep = suite.report(batch).withColumn("batch_id", F.lit(batch_id))
        rep.coalesce(1).write.mode("append").parquet(history_path)

    writer = (
        stream.writeStream.foreachBatch(write_report)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
