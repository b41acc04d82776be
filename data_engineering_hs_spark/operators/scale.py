"""Scale-path join strategies: bucketing and skew salting.

The reference hand-optimizes joins only via broadcast (SURVEY §4);
at 100 TB the other two levers are:

- **Bucketed tables** (`write_bucketed`): persist both join sides
  pre-hash-partitioned and sorted on the key. A later equi-join reads
  bucket-aligned splits and sort-merges with NO Exchange on either
  side — the one-time shuffle at write amortizes across every
  downstream join/agg on that key (ClickHouse MergeTree order_by
  analog, fct_orders.sql:13-15).
- **Salted join** (`salted_join`): for a skewed fact key (the
  reference generates intentionally skewed countries,
  generate_data_json.py:62-64), explode the dim side into
  `salt_buckets` copies and scatter the fact side's hot keys across
  salts, so no single reducer owns a hot key. AQE's skew-join split
  handles moderate skew automatically; salting is the explicit fix
  when one key dominates a partition entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+sorted) managed table. Joins/aggs on
    bucket_cols between tables with the same bucketing skip their
    Exchange (verified in tests by plan inspection)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name, format="parquet")


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on `key`: fact rows get a scattered salt,
    the dim side is replicated across all salts, and the join key
    becomes (key, salt). Output columns match a plain
    `fact.join(dim, key)`.

    Use when one key's row count dwarfs the per-task budget; for
    moderate skew prefer plain join + AQE skewJoin (on by default in
    this engine's session factory).
    """
    # Salt from the row's POSITION, not its content: a content hash
    # (xxhash64 of all columns) sends byte-identical duplicate fact
    # rows to ONE salt bucket, so salting degrades exactly on the
    # corpus it exists for (hot keys full of exact-duplicate rows).
    # monotonically_increasing_id is unique per row regardless of
    # content; hashing it scatters hot keys uniformly.
    salt = F.pmod(
        F.xxhash64(F.col(key), F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    )
    fact_salted = fact.withColumn("__salt", salt)
    salts = fact.sparkSession.range(salt_buckets).select(
        F.col("id").alias("__salt")
    )
    dim_salted = dim.crossJoin(F.broadcast(salts))
    out = fact_salted.join(dim_salted, [key, "__salt"], how)
    return out.drop("__salt")
