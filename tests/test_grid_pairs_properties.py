"""Property-based exactness proof for ``grid_self_pairs``.

It underpins q36 (embedding near-dup), q79 (fuzzy match) and q114
(SemDeDup): if the grid decomposition ever produced a pair twice or
dropped one, those results would be silently wrong.  Invariant: for ANY
row multiset and ANY grid size, the output pair multiset equals the
brute-force {(block, a, b) : a.id < b.id, same block} set — every pair
exactly once, including grid=1 (degenerate, no decomposition) and ids
colliding into the same grid cell.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stock_ops_spark.operators.similarity import grid_self_pairs

# small id/block domains force same-cell collisions and hot blocks
rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # vec_id
        st.sampled_from(["x", "y", "z"]),        # block
    ),
    min_size=0,
    max_size=14,
    unique_by=lambda t: t[0],  # ids unique, blocks collide freely
)


def brute_force(rows):
    out = set()
    by_block: dict[str, list[int]] = {}
    for vid, blk in rows:
        by_block.setdefault(blk, []).append(vid)
    for blk, ids in by_block.items():
        for a, b in combinations(sorted(ids), 2):
            out.add((blk, a, b))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, grid=st.integers(min_value=1, max_value=5))
def test_every_pair_exactly_once(spark, rows, grid):
    df = spark.createDataFrame(rows or [(0, "x")], "vec_id long, block string")
    if not rows:
        df = df.where("1 = 0")
    got = [
        (r.block, r.a.vec_id, r.b.vec_id)
        for r in grid_self_pairs(df, ["block"], id_col="vec_id", grid=grid).collect()
    ]
    assert len(got) == len(set(got)), "a pair was produced more than once"
    assert set(got) == brute_force(rows)
