"""Interval-overlap join — the two-sided range join Spark lacks.

``[s1, e1) overlaps [s2, e2)`` compiles naively to a theta join
(``s1 < e2 AND s2 < e1``), which Spark executes as BroadcastNestedLoop
or a cartesian product — quadratic and driver-hostile at any real
size.  The scale-correct strategy is the standard GRID BUCKETING used
by spatial engines: quantize time into cells of width ``grid``, emit
each interval once per cell it touches, equi-join on (keys…, cell) —
a plain shuffled hash join — then re-check the exact overlap
predicate as a residual filter.

Duplicate suppression is O(0): a pair overlapping across several
shared cells would match once per cell, so the join keeps only the
match in the REFERENCE cell ``floor(max(s1, s2) / grid)`` — every
overlapping pair has exactly one such cell (max(s1,s2) lies inside
the overlap), so no ``distinct`` shuffle is ever needed.

Cell fan-out is bounded by interval length / grid + 1; pick ``grid``
near the typical interval length (the q314 consumer uses the interval
length itself, giving ≤ 2 cells per interval).

Reference parity: none — the reference joins trades/quotes on exact
co-timestamps only (J3); interval semantics are part of the extension
surface.  DuckDB executes the same logical join natively via IEJoin,
which is what makes the oracle cheap to state (plain inequality SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    grid: int,
    keys: list[str] | None = None,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
) -> DataFrame:
    """All (left, right) row pairs whose half-open intervals
    ``[left_start, left_end)`` and ``[right_start, right_end)`` overlap,
    optionally restricted to equal ``keys``.  Interval bounds must be
    integers (epoch ms/s, positions); ``grid`` > 0 is the cell width.

    Columns of both inputs survive with ``l_``/``r_`` prefixes on name
    collisions (keys survive unprefixed once).
    """
    if grid <= 0:
        raise ValueError(f"grid must be positive, got {grid}")
    keys = list(keys or [])

    def cells(s: str, e: str) -> F.Column:
        # half-open: an interval touching cell boundary e exactly does
        # NOT occupy the cell starting at e
        return F.sequence(
            F.floor(F.col(s) / grid),
            F.floor((F.col(e) - 1) / grid),
        )

    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    both = set(lcols) & set(rcols)

    def pref(side: str, c: str) -> str:
        return f"{side}_{c}" if c in both else c

    lsel = [F.col(c) for c in keys] + [
        F.col(c).alias(pref("l", c)) for c in lcols
    ]
    rsel = [F.col(c) for c in keys] + [
        F.col(c).alias(pref("r", c)) for c in rcols
    ]
    ls, le = pref("l", left_start), pref("l", left_end)
    rs, re_ = pref("r", right_start), pref("r", right_end)

    lx = left.select(*lsel).withColumn(
        "__cell", F.explode(cells(ls, le))
    )
    rx = right.select(*rsel).withColumn(
        "__cell", F.explode(cells(rs, re_))
    )
    joined = lx.join(rx, [*keys, "__cell"])
    overlap = (F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le))
    # reference-cell rule: keep the pair only in the cell that holds
    # max(s1, s2) — exactly one cell per overlapping pair, no distinct
    ref_cell = F.floor(F.greatest(F.col(ls), F.col(rs)) / grid)
    return joined.where(overlap & (F.col("__cell") == ref_cell)).drop(
        "__cell"
    )


def interval_overlap_join_naive(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | None = None,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
) -> DataFrame:
    """Theta-join twin for testing: same output, quadratic plan.  Never
    use at scale — exists so the grid path has an in-engine equality
    oracle in addition to the DuckDB one."""
    keys = list(keys or [])
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    both = set(lcols) & set(rcols)

    def pref(side: str, c: str) -> str:
        return f"{side}_{c}" if c in both else c

    lsel = [F.col(c) for c in keys] + [
        F.col(c).alias(pref("l", c)) for c in lcols
    ]
    rsel = [F.col(c) for c in keys] + [
        F.col(c).alias(pref("r", c)) for c in rcols
    ]
    lx = left.select(*lsel)
    rx = right.select(*rsel)
    ls, le = pref("l", left_start), pref("l", left_end)
    rs, re_ = pref("r", right_start), pref("r", right_end)
    cond = (F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le))
    if keys:
        joined = lx.join(rx, keys)
        return joined.where(cond)
    return lx.crossJoin(rx).where(cond)
