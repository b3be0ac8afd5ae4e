"""Custom stateful streaming operators (ST4 upgrade).

The reference keeps no in-stream state (stats are per-batch table
increments); Spark's ``applyInPandasWithState`` unlocks true running state
per key.  ``running_vwap`` maintains cumulative volume-weighted average
price per ticker across micro-batches — the canonical custom stateful
operator a trading pipeline wants and SQL can't express incrementally.

State layout: (sum_pv: double, sum_v: long, n_trades: long) per ticker.
Works identically under ``update`` output mode with checkpointed state;
the batch twin (for tests/oracles) is a plain groupBy aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

VWAP_OUTPUT = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("vwap", DoubleType(), True),
        StructField("total_volume", LongType(), True),
        StructField("n_trades", LongType(), True),
    ]
)

VWAP_STATE = StructType(
    [
        StructField("sum_pv", DoubleType(), True),
        StructField("sum_v", LongType(), True),
        StructField("n", LongType(), True),
    ]
)


def _vwap_fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    sum_pv, sum_v, n = state.get if state.exists else (0.0, 0, 0)
    for pdf in pdfs:
        valid = pdf.dropna(subset=["price", "volume"])
        sum_pv += float((valid["price"] * valid["volume"]).sum())
        sum_v += int(valid["volume"].sum())
        n += len(valid)
    state.update((sum_pv, sum_v, n))
    vwap = (sum_pv / sum_v) if sum_v else None
    yield pd.DataFrame(
        {
            "ticker": [key[0]],
            "vwap": [vwap],
            "total_volume": [sum_v],
            "n_trades": [n],
        }
    )


def running_vwap(trades: DataFrame) -> DataFrame:
    """Per-ticker running VWAP over a streaming (or batch) trades frame.

    On a stream: emits the updated running value every micro-batch
    (outputMode 'update'); state survives restarts via the checkpoint.
    """
    return (
        trades.select("ticker", "price", "volume")
        .groupBy("ticker")
        .applyInPandasWithState(
            _vwap_fn,
            outputStructType=VWAP_OUTPUT,
            stateStructType=VWAP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_vwap(trades: DataFrame) -> DataFrame:
    """Batch twin of running_vwap (same formula, plain aggregate) — the
    ground truth the stateful operator must converge to after draining."""
    valid = trades.where(F.col("price").isNotNull() & F.col("volume").isNotNull())
    return valid.groupBy("ticker").agg(
        (F.sum(F.col("price") * F.col("volume")) / F.sum("volume")).alias("vwap"),
        F.sum("volume").cast("long").alias("total_volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )
