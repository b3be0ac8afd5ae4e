"""SparkSession builder tuned for this engine.

Design notes (100 TB posture)
-----------------------------
- Session timezone pinned to UTC: every event-time column is stored as UTC
  and converted to exchange-local time explicitly with
  ``from_utc_timestamp`` (mirrors the reference's epoch-UTC storage,
  reference ``src/stockops/data/utils.py:102-145``).
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic join-strategy demotion are exactly the knobs that keep the same
  plan healthy from sf0.001 (6k rows) to 100 TB.
- ``spark.sql.shuffle.partitions`` defaults to a small value locally; on a
  real cluster AQE's coalescing makes the initial number mostly irrelevant
  as long as it is high enough, so we expose it as an argument.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: Streaming state-store providers.  The default (HDFS-backed) keeps all
#: state on the executor heap with an HDFS snapshot — fine for bounded
#: demo state, fatal when stream-stream join state reaches 100 TB-scale
#: cardinalities.  RocksDB spills state off-heap to local disk with
#: incremental checkpointing and is the survivable provider at scale.
STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "stock_ops_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Parameters are overridable for tests/bench; defaults come from env:
    ``SPARK_GRAFT_CPUS`` (local parallelism) is respected when no master is
    given.  ``state_store`` (or env ``SPARK_GRAFT_STATE_STORE``) selects the
    streaming state-store provider: ``"rocksdb"`` for large-state
    deployments, ``"hdfs"`` (Spark's default) otherwise.  The conf is a
    runtime SQL conf read at stream start, so it also applies when the
    session already exists.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_str = os.environ.get("SPARK_GRAFT_CPUS", "32")
        try:
            shuffle_partitions = max(int(cpus_str), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Untagged TIMESTAMP(MICROS) parquet (isAdjustedToUTC absent) would
        # otherwise be inferred as TIMESTAMP_NTZ on Spark 4.1+, forking the
        # engine's timestamp type by file encoding.  catalog.normalize_ts is
        # the load-path fix; this is defense-in-depth for raw reads.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    if state_store is None:
        state_store = os.environ.get("SPARK_GRAFT_STATE_STORE")
    # validate BEFORE getOrCreate so a bad value cannot leave a live
    # session behind as a side effect of a failed call
    provider = None
    if state_store:
        try:
            provider = STATE_STORE_PROVIDERS[state_store.lower()]
        except KeyError:
            raise ValueError(
                f"unknown state_store {state_store!r}; "
                f"choose from {sorted(STATE_STORE_PROVIDERS)}"
            ) from None
    spark = builder.getOrCreate()
    if provider:
        # runtime SQL conf, read when each streaming query starts — works on
        # a pre-existing session too (getOrCreate ignores builder confs then)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    # Python workers must be able to import this package even when the
    # driver found it via a sys.path insert (foreign cwd — the grading
    # driver contract); idempotent, ~ms. See stock_ops_spark/shipping.py.
    from stock_ops_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(spark)
    return spark
