"""Interval-overlap join: the grid-bucket strategy must equal the
naive theta join on randomized interval sets (including the boundary
cases the reference-cell dedup rule exists for), with a plan that
contains NO cartesian/nested-loop join."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from stock_ops_spark.operators.intervals import (
    interval_overlap_join,
    interval_overlap_join_naive,
)


def _pairs(df, keys=("user",)):
    cols = [*keys, "l_id", "r_id"]
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def _frames(spark, seed, n=120, span=1000):
    rng = random.Random(seed)

    def mk(tag):
        rows = []
        for i in range(n):
            s = rng.randrange(0, span)
            e = s + rng.randrange(1, 60)
            rows.append((rng.randrange(4), i, s, e))
        return spark.createDataFrame(
            rows, "user int, id long, start long, end long"
        )

    return mk("l"), mk("r")


@pytest.mark.parametrize("seed", [7, 21])
@pytest.mark.parametrize("grid", [1, 13, 60, 512])
def test_grid_join_equals_naive(spark, seed, grid):
    left, right = _frames(spark, seed)
    got = _pairs(
        interval_overlap_join(left, right, grid=grid, keys=["user"])
    )
    want = _pairs(
        interval_overlap_join_naive(left, right, keys=["user"])
    )
    assert got == want and want  # non-trivial overlap sets


def test_exactly_once_across_shared_cells(spark):
    """A pair overlapping across many shared cells must appear ONCE
    (the reference-cell rule, not a distinct)."""
    left = spark.createDataFrame(
        [(1, 10, 0, 500)], "user int, id long, start long, end long"
    )
    right = spark.createDataFrame(
        [(1, 20, 100, 400)], "user int, id long, start long, end long"
    )
    out = interval_overlap_join(left, right, grid=50, keys=["user"])
    assert out.count() == 1


def test_half_open_boundaries(spark):
    """[0,10) and [10,20) do NOT overlap; [0,11) and [10,20) do —
    and a cell-boundary end never occupies the next cell."""
    left = spark.createDataFrame(
        [(1, 1, 0, 10), (1, 2, 0, 11)],
        "user int, id long, start long, end long",
    )
    right = spark.createDataFrame(
        [(1, 9, 10, 20)], "user int, id long, start long, end long"
    )
    got = _pairs(interval_overlap_join(left, right, grid=10, keys=["user"]))
    assert got == {(1, 2, 9)}


def test_no_keys_still_correct_and_no_cartesian(spark):
    left, right = _frames(spark, 5, n=40)
    got = _pairs(
        interval_overlap_join(
            left.drop("user"), right.drop("user"), grid=30
        ),
        keys=(),
    )
    want = _pairs(
        interval_overlap_join_naive(left.drop("user"), right.drop("user")),
        keys=(),
    )
    assert got == want
    plan = (
        interval_overlap_join(left.drop("user"), right.drop("user"), grid=30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_grid_must_be_positive(spark):
    left, right = _frames(spark, 1, n=2)
    with pytest.raises(ValueError, match="grid"):
        interval_overlap_join(left, right, grid=0)
