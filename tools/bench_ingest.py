"""Ingest-path throughput: rows/s through the full
dedup/version/stats/partitioned-write pipeline (the BASELINE.md
comparison point — the reference's single-writer envelope is 50–5,000
rows/s).

    python tools/bench_ingest.py [n_rows]

Prints one JSON line: fresh-ingest rows/s, dedup-probe (full replay,
zero appended) rows/s, and mixed (half dup / half new) rows/s.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import tempfile

    from stock_ops_spark import schemas as S
    from stock_ops_spark.session import get_spark
    from stock_ops_spark.sources.ingest import ParquetStore

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("bench-ingest")
    base = 1736951400
    tickers = ["SPY", "VOO", "QQQ", "IWM"]

    def batch(lo: int, hi: int):
        rows = [
            (
                tickers[i % 4],
                base + (i // 4) * 60,
                1.0 + i % 7,
                2.0 + i % 7,
                0.5,
                1.5 + i % 3,
                10 + i % 100,
                "1m",
            )
            for i in range(lo, hi)
        ]
        return spark.createDataFrame(rows, schema=S.HISTORICAL_INTRADAY)

    with tempfile.TemporaryDirectory() as tmp:
        store = ParquetStore(spark, f"{tmp}/store")
        b = batch(0, n).localCheckpoint(eager=True)  # exclude row build from timing

        t0 = time.monotonic()
        appended = store.ingest_batch(b, "historical_intraday")
        fresh_s = time.monotonic() - t0
        assert appended == n

        t0 = time.monotonic()
        assert store.ingest_batch(b, "historical_intraday") == 0  # full replay
        probe_s = time.monotonic() - t0

        half = batch(n // 2, n + n // 2).localCheckpoint(eager=True)
        t0 = time.monotonic()
        assert store.ingest_batch(half, "historical_intraday") == n // 2
        mixed_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "metric": "ingest_rows_per_sec",
                "n_rows": n,
                "fresh": round(n / fresh_s),
                "dedup_probe": round(n / probe_s),
                "mixed_half_dup": round(n / mixed_s),
            }
        )
    )


if __name__ == "__main__":
    main()
