"""SparkSession factory with the engine's pinned configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "adscraper_spark", cpus: int | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cpus)
    builder = (
        SparkSession.builder
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # A bucketed pages corpus is thousands of hive partition dirs;
        # the default threshold (32) pushes their discovery into a
        # distributed listing job whose fixed latency dwarfs the
        # driver-side stat() loop on any local/posix store. Real
        # clusters with object-store corpora use Iceberg manifests and
        # never list at all (store.py module docstring).
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "100000")
    )
    # Under spark-submit the JVM gateway already exists and carries the
    # --master / --driver-memory the operator chose (cluster deploys:
    # spark-submit --py-files adscraper_spark.zip); only a standalone
    # python process pins local[N] + driver memory itself.
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = (builder
                   .master(f"local[{cpus}]")
                   .config("spark.driver.memory",
                           os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")))
    return builder.getOrCreate()
