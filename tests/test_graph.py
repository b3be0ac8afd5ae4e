"""Connected components: min-label propagation (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_ops_spark.operators.graph import cluster_summary, connected_components


def test_components_chain_triangle_singleton(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated node 99
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 12, 99)], "n long")
    comp = {r.node: r.component for r in connected_components(edges, nodes=nodes).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}

    sizes = {
        r.component: r.size
        for r in cluster_summary(connected_components(edges, nodes=nodes)).collect()
    }
    assert sizes == {1: 4, 10: 3, 99: 1}


def test_components_long_chain_converges(spark):
    # a 30-node path exercises multi-round propagation and the
    # convergence probe (diameter 29 < max_iters default 50)
    n = 30
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = connected_components(edges)
    assert {r.component for r in out.collect()} == {0}
    assert out.count() == n


def test_components_without_node_universe(spark):
    edges = spark.createDataFrame([(5, 7)], "id_a long, id_b long")
    got = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert got == {(5, 5), (7, 5)}


# -- property: Spark CC == pure-Python union-find on arbitrary graphs ------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

edge_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=18,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical component = min member
    comp = {}
    for n in parent:
        comp[n] = find(n)
    return comp


@given(edges=edge_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_pagerank_cycle_is_stationary(spark):
    from stock_ops_spark.operators.graph import pagerank

    e = spark.createDataFrame([("a", "b"), ("b", "a")], "s string, d string")
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    assert got == {"a": 1.0, "b": 1.0}  # symmetric cycle: rank stays at init


def test_pagerank_star_hand_computed(spark):
    from stock_ops_spark.operators.graph import pagerank

    e = spark.createDataFrame([("a", "b"), ("a", "c")], "s string, d string")
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=2).collect()}
    assert abs(got["a"] - 0.15) < 1e-12          # no inbound edges
    expected_leaf = 0.15 + 0.85 * (0.15 / 2)     # round 2: only a's 0.15 flows
    assert abs(got["b"] - expected_leaf) < 1e-12
    assert abs(got["c"] - expected_leaf) < 1e-12


def test_pagerank_cached_persists_one_run(spark, tmp_path, monkeypatch):
    """Second call must serve the persisted rank artifact, not re-iterate;
    a changed variant/params or a rewritten source must invalidate."""
    import stock_ops_spark.operators.graph as G

    src = tmp_path / "edges_src.txt"
    src.write_text("sentinel")  # identity file: path+mtime+size keys the cache
    cache = str(tmp_path / "models")
    e = spark.createDataFrame([("a", "b"), ("a", "c")], "s string, d string")
    first = {
        r["node"]: r["rank"]
        for r in G.pagerank_cached(
            e, str(src), variant="t", iters=2, cache_dir=cache
        ).collect()
    }
    assert abs(first["a"] - 0.15) < 1e-12

    def boom(*a, **kw):
        raise AssertionError("re-iteration attempted despite cached artifact")

    monkeypatch.setattr(G, "pagerank", boom)
    again = {
        r["node"]: r["rank"]
        for r in G.pagerank_cached(
            e, str(src), variant="t", iters=2, cache_dir=cache
        ).collect()
    }
    assert again == first

    import pytest

    # different variant or iteration count → different key → (blocked) rerun
    with pytest.raises(AssertionError, match="re-iteration attempted"):
        G.pagerank_cached(e, str(src), variant="other", iters=2, cache_dir=cache)
    with pytest.raises(AssertionError, match="re-iteration attempted"):
        G.pagerank_cached(e, str(src), variant="t", iters=3, cache_dir=cache)

    # rewritten source file (new mtime/size) → stale artifact not served
    src.write_text("sentinel-v2")
    with pytest.raises(AssertionError, match="re-iteration attempted"):
        G.pagerank_cached(e, str(src), variant="t", iters=2, cache_dir=cache)


def test_copurchase_edges_count_distinct_orders(spark):
    """A part duplicated INSIDE one order must not inflate the pair
    weight: w counts distinct orders containing both parts."""
    from stock_ops_spark.operators.graph import copurchase_edges

    rows = [
        # order 1: part 10 twice + part 20 once -> one co-order, not two
        (1, 10), (1, 10), (1, 20),
        # order 2: both again -> support reaches 2
        (2, 10), (2, 20),
        # order 3: 10 with 30 only once -> below support
        (3, 10), (3, 30),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {(r.pa, r.pb): r.w for r in copurchase_edges(li, support=2).collect()}
    assert got == {(10, 20): 2}
