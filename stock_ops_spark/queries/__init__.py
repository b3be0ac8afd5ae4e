"""The engine's query library — driver-contract surface (package form).

``QUERIES``/``ORACLES`` and every ``qNNN_*`` function re-export here
unchanged; the registry is assembled by importing the domain modules in
the original single-file order, so key set AND iteration order are
byte-identical to the pre-split module.  See ``_base.py`` for the
cross-engine hash-comparison conventions every entry follows.
"""

from __future__ import annotations

from stock_ops_spark.queries._base import (  # noqa: F401
    ORACLES,
    QUERIES,
    _neardup_pairs,
    _register,
    _rev4,
    _t,
)
from stock_ops_spark.queries import core  # noqa: E402
from stock_ops_spark.queries import timeseries_clustering  # noqa: E402
from stock_ops_spark.queries import text_analytics  # noqa: E402
from stock_ops_spark.queries import orders_analytics  # noqa: E402
from stock_ops_spark.queries import scale_ops  # noqa: E402
from stock_ops_spark.queries import retrieval_models  # noqa: E402
from stock_ops_spark.queries import scheduling_ops  # noqa: E402

# attribute surface: Q.q13_session_ohlc etc. keep working
for _m in (core, timeseries_clustering, text_analytics, orders_analytics,
           scale_ops, retrieval_models, scheduling_ops):
    for _k in dir(_m):
        if _k[:1] == "q" and len(_k) > 1 and _k[1].isdigit():
            globals()[_k] = getattr(_m, _k)
del _m, _k
