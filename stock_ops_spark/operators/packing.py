"""Greedy sequence packing for training-batch construction.

Packs variable-length documents into fixed-capacity bins (context
windows) with the deterministic in-order first-fit rule: walk the shard
in a stable order, keep appending to the open bin until the next item
would overflow, then open a new bin.  An item larger than the capacity
gets a bin of its own.

Scale shape: packing is SEQUENTIAL within a shard by definition (each
bin decision depends on the running fill), so the operator parallelizes
across shards — `applyInPandas` per shard key, one exchange, a tight
numpy loop inside each Arrow batch.  At 100 TB the shard key is whatever
the corpus is already partitioned by (source, date, bucket), so the
exchange collapses onto the existing layout.  This is the standard
pre-tokenized-corpus packing pass (the "greedy packing" in T5/LLM data
pipelines); no Spark built-in expresses a capacity-reset running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

import pandas as pd


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row a ``bin_id`` (0-based per shard) and its
    ``offset`` (running fill before the row) under in-order greedy
    first-fit packing of ``size_col`` into bins of ``capacity``."""
    out_schema = (
        f"{shard_col} string, {order_col} long, {size_col} long, "
        "bin_id long, offset long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        sizes = pdf[size_col].to_numpy()
        bins = [0] * len(sizes)
        offs = [0] * len(sizes)
        bin_id, cum = 0, 0
        for i, sz in enumerate(sizes):
            if i > 0 and cum + sz > capacity:
                bin_id += 1
                cum = 0
            bins[i] = bin_id
            offs[i] = cum
            cum += sz
        pdf = pdf[[shard_col, order_col, size_col]].copy()
        pdf["bin_id"] = bins
        pdf["offset"] = offs
        return pdf

    return (
        df.select(shard_col, order_col, size_col)
        .groupBy(shard_col)
        .applyInPandas(pack, schema=out_schema)
    )
