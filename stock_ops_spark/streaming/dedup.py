"""Online (at-ingest) near-duplicate flagging.

The batch dedup pipeline (operators/dedup.py) finds near-dup pairs
WITHIN a corpus; a streaming corpus also needs each arriving micro-batch
checked AGAINST EVERYTHING ALREADY INGESTED without rescanning it.  The
standard answer is a persisted LSH band index:

- per batch: shingle → minhash signatures → banded bucket keys
- probe: new (band, bucket) keys equi-join the persisted index — only
  hash-colliding history is ever touched, never the full corpus
- score: for candidate pairs, estimated Jaccard = fraction of agreeing
  minhash components (the classic unbiased MinHash estimator) — no
  stored text needed, signatures only
- append: the batch's bands + signatures join the index

State grows O(corpus × bands) rows of 3 longs — the index is ~1% of a
text corpus and partitions on (band, bucket): at 100 TB the probe is a
shuffle of the BATCH against a bucketed index, with AQE handling hot
buckets.  Flags are advisory (estimator noise ~1/sqrt(k)); destructive
dedup downstream re-verifies exactly (jaccard_verify) on the flagged
sliver only.

Reference parity: the reference dedups exact re-sends at ingest
(`src/stockops/data/database/sql_db.py:487-497`); near-dup flagging is
part of the training-data extension surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_ops_spark.operators.dedup import (
    band_stack,
    minhash_signatures,
    shingle_sets,
)


class StreamingNearDupIndex:
    """Persisted LSH band index with per-batch probe + append.

    Wire ``process_batch`` into ``foreachBatch`` (streaming) or call it
    directly per ingest batch.  Layout under ``root``:

    - ``bands/``  (id, band, bucket) probe index
    - ``sigs/``   (id, mh_0..mh_{k-1}) signatures for scoring
    - ``flags/``  (new_id, matched_id, est_jaccard) advisory output
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n

    def _path(self, part: str) -> str:
        return os.path.join(self.root, part)

    def _existing(self, part: str) -> DataFrame | None:
        p = self._path(part)
        if not os.path.isdir(p):
            return None
        return self.spark.read.parquet(p)

    def process_batch(self, batch: DataFrame) -> int:
        """Probe ``batch`` against the index, append its signatures, and
        return the number of advisory near-dup flags written."""
        sh = shingle_sets(batch, self.id_col, self.text_col, n=self.shingle_n)
        # sever lineage: signatures are consumed by probe AND append, and
        # the append writes under a directory the probe reads
        sigs = minhash_signatures(sh, num_hashes=self.num_hashes).localCheckpoint(
            eager=True
        )
        stacked = band_stack(sigs, num_hashes=self.num_hashes, bands=self.bands)

        n_flags = 0
        idx = self._existing("bands")
        if idx is not None:
            old_sigs = self._existing("sigs")
            cand = (
                stacked.join(
                    idx.select(
                        F.col("id").alias("matched_id"), "band", "bucket"
                    ),
                    ["band", "bucket"],
                )
                .where(F.col("id") != F.col("matched_id"))
                .select(F.col("id").alias("new_id"), "matched_id")
                .distinct()
            )
            agree = sum(
                F.when(F.col(f"l_mh_{i}") == F.col(f"r_mh_{i}"), 1).otherwise(0)
                for i in range(self.num_hashes)
            )
            lsig = sigs.select(
                F.col("id").alias("new_id"),
                *[F.col(f"mh_{i}").alias(f"l_mh_{i}") for i in range(self.num_hashes)],
            )
            rsig = old_sigs.select(
                F.col("id").alias("matched_id"),
                *[F.col(f"mh_{i}").alias(f"r_mh_{i}") for i in range(self.num_hashes)],
            )
            flagged = (
                cand.join(lsig, "new_id")
                .join(rsig, "matched_id")
                .select(
                    "new_id",
                    "matched_id",
                    (agree / F.lit(float(self.num_hashes))).alias("est_jaccard"),
                )
                .where(F.col("est_jaccard") >= self.threshold)
                .localCheckpoint(eager=True)
            )
            n_flags = flagged.count()
            if n_flags:
                flagged.write.mode("append").parquet(self._path("flags"))

        stacked.write.mode("append").parquet(self._path("bands"))
        sigs.write.mode("append").parquet(self._path("sigs"))
        return n_flags

    def flags(self) -> DataFrame | None:
        return self._existing("flags")
