"""SparkSession factory.

The reference builds sessions ad hoc per notebook
(revenue_analysis/main.ipynb cell 6cbdb7fa: local[8] + Arrow;
mini-lab-hdfs+spark-local/spark.ipynb:40: Arrow). This engine
centralizes one factory with scale-ready defaults:

- UTC session timezone (reference pins UTC everywhere:
  generate_fuel_exports.py uses tz="UTC" timestamps; lab02 logs are
  +0000) so time-of-day predicates are deterministic.
- Arrow on for any pandas interchange (vectorized Pandas UDFs).
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast conversion — the scale path for
  the skewed keys the reference intentionally generates
  (revenue_analysis/generate_data_json.py:62-64 skewed countries).
- shuffle.partitions default sized for local test runs; on a real
  cluster AQE coalescing makes a higher initial number safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "data_engineering_hs_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a cluster, ``master`` is left to spark-submit; locally defaults
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Nested-schema pruning so struct projections reach the scan
        # (the reference projects 9 of ~15 nested order fields,
        # client_async.py:32-42).
        "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
        # Spill-aware scan sizing. 128m is right when files dwarf the
        # core count (production); at test SFs a single 11 MB parquet
        # would scan as ONE task while 31 cores idle, so the local
        # default splits small files across the machine. Override with
        # SPARK_GRAFT_MAX_PARTITION_BYTES (use 128m+ on a cluster).
        "spark.sql.files.maxPartitionBytes": os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"
        ),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
