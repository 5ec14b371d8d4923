"""SparkSession builder with scale-aware defaults.

Mirrors the reference's session config (demo.ipynb c3:2-5: Kryo serializer,
Java 17, driver memory) and adds the configs a 1000-executor / 100 TB
deployment needs from day one: AQE (runtime re-planning, skew-join splitting,
partition coalescing), Arrow for every Python<->JVM batch boundary, UTC
session time zone (cross-engine determinism for the DuckDB oracle), and a
shuffle-partition count sized for the local test harness but overridable per
deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the local[32] test harness; production deployments
# override via env or .config() — nothing below is load-bearing for
# correctness, only for plan quality.
_DEFAULTS = {
    # --- adaptive execution: re-plan at runtime from real shuffle stats.
    # At 100 TB this is what converts a mis-estimated sort-merge join into a
    # broadcast join and splits skewed partitions instead of OOMing one task.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- Arrow on every pandas/toPandas boundary (reference collects with
    # toPandas, demo.ipynb c11:13; our embedding/mapInPandas stages need it).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- determinism: DuckDB oracle runs in UTC; timestamps must agree.
    "spark.sql.session.timeZone": "UTC",
    # --- reference parity: Kryo serializer (demo.ipynb c3:2, raw L86).
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # --- shuffle sizing for local mode; a real cluster sets this to
    # ~2-3x total cores (AQE coalesces the excess).
    "spark.sql.shuffle.partitions": "32",
    # 128 MB parquet split targets keep scan tasks uniform at scale.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # testdata events.ts is parquet TIMESTAMP(NANOS); read as long + convert
    # (catalog.read_table) instead of failing the scan.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def traded_shuffle_partitions(spark: SparkSession) -> int:
    """Partition target for a repartition that REPLACES a downstream
    shuffle (winnow's pre-explode repartition, the triangle edge-build
    pre-aggregate). The exchange being traded away would have run at
    ``spark.sql.shuffle.partitions`` (plus AQE sizing), so the
    replacement must carry AT LEAST that parallelism — on clusters
    where shuffle partitions exceed core count, targeting bare
    ``defaultParallelism`` would pin the traded pipeline BELOW the plan
    it replaces. max() of the two also keeps the small-input CPU
    guarantee on local harnesses where shuffle.partitions is tuned
    down. (Local harness: both are 32, so plans are unchanged.)"""
    dp = spark.sparkContext.defaultParallelism
    try:
        sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        sp = 0          # e.g. "auto" under some AQE configs
    return max(dp, sp)


def get_spark(app_name: str = "pydata_vector_search_spark",
              master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    tests and bench share one code path; on a cluster pass None and let
    spark-submit own it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
