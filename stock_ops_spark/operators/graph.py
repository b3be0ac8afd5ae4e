"""Distributed connected components — dedup-cluster formation.

Near-dup pair generation (minhash LSH, simhash banding, embedding
blocking — operators/dedup.py, operators/similarity.py) yields EDGES;
canonicalizing a corpus needs the transitive closure: every document in a
duplicate CLUSTER collapses to one canonical representative.  This is
min-label propagation over the pair graph, the standard Spark-shaped
formulation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14):

- labels start as each node's own id;
- each round, every node takes the min label among itself and its
  neighbors (one shuffle: edges ⋈ labels, then a min-agg);
- converged when no label changed (one bounded `isEmpty` probe per
  round — a driver *flag*, not driver data).

Rounds needed = graph diameter.  Dedup clusters are dense blobs of
mutual near-dups (diameter 2-4 in practice), so propagation beats the
O(log n)-guaranteed-but-constant-heavy large-star/small-star alternation
for this workload; ``max_iters`` caps adversarial chains.  Each round
localCheckpoints the labels to sever the growing lineage — iteration i
re-reads a materialized frame, not a 2^i-deep plan.

No reference twin: the reference dedups exact rows only
(sql_db.py:487-497); clustering is part of the training-data extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iters: int = 50,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair once is enough).  ``nodes``
    optionally supplies the full node universe (single-column DataFrame);
    nodes without any edge become singleton components — exactly what a
    dedup pipeline wants (unique docs keep themselves as canonical).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    bi = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    bi = bi.repartition("s").localCheckpoint(eager=True)  # reused every round

    labels = bi.select(F.col("s").alias("node")).distinct()
    if nodes is not None:
        universe = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        labels = labels.union(universe).distinct()
    labels = labels.withColumn("label", F.col("node")).localCheckpoint(eager=True)

    for _ in range(max_iters):
        msgs = bi.join(labels, bi.s == labels.node).select(
            F.col("d").alias("node"), F.col("label")
        )
        new = (
            labels.select("node", "label")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
        )
        labels = new
        if changed.limit(1).isEmpty():
            break
    return labels.select("node", F.col("label").alias("component"))


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-cluster accounting: size and canonical (min) member — the
    scrub-plan view a dedup job reports before dropping non-canonicals."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("size"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "s",
    dst: str = "d",
    iters: int = 3,
    damping: float = 0.85,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list: the standard
    power iteration rank(v) = (1-d) + d * Σ rank(u)/outdeg(u).

    Spark shape: out-degrees are one aggregate; each iteration is one
    join (ranks ⋈ edges on src) + one aggregate (sum contributions by
    dst) — exactly two exchanges per round, both on the node key, so at
    scale a pre-partitioned edge table makes the join co-located.  Ranks
    are localCheckpointed each round to sever the growing lineage (the
    same discipline as connected_components above).  Nodes with no
    inbound edges settle at (1-d); dangling mass is not redistributed
    (callers wanting classic normalization feed a bidirected graph).
    """
    # Materialize the edge list WITH out-degrees once: every iteration
    # re-reads this frame instead of replaying the upstream join/distinct
    # lineage (3 iterations of a lazily recomputed fact-join cost ~5x the
    # whole algorithm before this was checkpointed).
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ew = e.join(outdeg, "s").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        # With broadcast_ranks the rank vector ships to every task and the
        # EDGE LIST NEVER SHUFFLES for the join — each iteration is a
        # broadcast hash join + partial agg + one small exchange on node.
        # Use when |nodes| ≪ |edges| (rank vector ~16 B/node); the default
        # shuffle join is the general any-scale path.
        rside = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            rside.join(ew, ranks.node == ew.s)
            .select(F.col("d").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
