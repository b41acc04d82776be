"""Parquet sinks/sources (SURVEY.md §2.1 S8-S12).

Partitioned overwrite + pruned reads are the storage backbone:
`df.write.partitionBy("date").parquet(...)` (revenue_analysis/
main.ipynb:298) and filter-on-partition-column reads that Catalyst
prunes to single directories (cell cf747d35). Snappy is Spark's
default codec, matching generate_fuel_exports.py:202.

Scale: dynamic partition overwrite replaces only touched partitions
(the incremental materialization primitive used by plans.model_dag);
sortWithinPartitions gives MergeTree-style clustering for read
locality (fct_orders.sql:13-15 order_by analog).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    dynamic: bool = False,
    cluster_by: Sequence[str] | None = None,
) -> None:
    """S8: partitioned parquet write; dynamic=True overwrites only the
    partitions present in df (incremental delete+insert semantics)."""
    writer = df
    if cluster_by:
        writer = df.sortWithinPartitions(*cluster_by)
    w = writer.write.mode(mode)
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.partitionBy(*partition_cols).parquet(path)


def read_pruned(
    spark: SparkSession, path: str, **partition_filters
) -> DataFrame:
    """S9: read the dataset root and filter on partition columns —
    Catalyst prunes to the matching directories (verified by
    PartitionFilters in the scan node, see tests)."""
    df = spark.read.parquet(path)
    for col, val in partition_filters.items():
        df = df.filter(df[col] == val)
    return df
