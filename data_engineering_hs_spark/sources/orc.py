"""ORC source/sink + binary-file ingestion.

ORC is the second columnar format a reference user migrating from a
Hive-era warehouse brings along (the reference's engines read it via
external tables); Spark supports it natively with the same
predicate-pushdown/column-pruning machinery as parquet, so the
engine exposes symmetric write/read helpers and a plan-asserted
pushdown guarantee (tests/test_sources.py).

binaryFile is the ingestion path for opaque media blobs
(operators/multimodal.py consumes the (path, length, content)
schema): one row per file with the bytes as a binary column —
exactly the layout the multimodal codec registry expects. For
many-small-file corpora set `pathGlobFilter` + a post-read
size-aware repartition (multimodal.repartition_by_bytes) rather than
relying on file-count parallelism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: Sequence[str] | None = None,
    compression: str = "snappy",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar read with the same pushdown contract as parquet —
    filters and projections reach the ORC scan (plan-asserted)."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """(path, modificationTime, length, content: binary) — one row
    per file. The multimodal ingest head: feed `content` straight to
    operators/multimodal decode/feature UDFs."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
