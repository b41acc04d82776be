"""Dataset profiling: the deequ/`dbt docs`-statistics analog.

- profile_table: one aggregation pass per statistics family over every
  column — (column, n_rows, n_nulls, n_distinct, min_str, max_str).
  The scan reads each column once; all stats reduce map-side, so the
  profile of a 100-TB table is one shuffle of a FEW rows per column.
  min/max serialize as strings so one long-format report covers mixed
  column types (the DuckDB oracle does the same).
- key_skew_stats: join/groupBy-key distribution diagnostics —
  (n_keys, n_rows, max_share, top1_cnt, p99_cnt). max_share is the
  hot-key fraction: > a few percent means a plain shuffle join will
  straggle and the key needs AQE skew-split or salting
  (operators.scale.salted_join). Run this BEFORE picking a join
  strategy at scale; it is the measurement the salting decision
  should cite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format per-column profile; exact counts (profiling runs
    offline — approx variants belong in monitoring, not the oracle-
    checked profile). All columns' stats compute in ONE aggregation
    (an array of per-column stat structs, exploded to rows), so the
    table scans exactly once however many columns it has."""
    cols = cols or df.columns

    def stats(c: str):
        col = F.col(c)
        return F.struct(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_str"),
            F.max(col).cast("string").alias("max_str"),
        )

    one = df.agg(F.array(*[stats(c) for c in cols]).alias("__a"))
    return one.select(F.explode("__a").alias("s")).select("s.*")


def key_skew_stats(df: DataFrame, key_col: str) -> DataFrame:
    """Single-row key-distribution summary for a prospective join/agg
    key. Two aggregations: per-key counts (map-side combined), then
    scalar stats over the (small) key-count frame."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__cnt"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__cnt").alias("n_rows"),
        F.max("__cnt").alias("top1_cnt"),
        (F.max("__cnt").cast("double") / F.sum("__cnt")).alias("max_share"),
        # Rounded: p99 is a linear interpolation between two integer
        # counts; shipping the raw double through an exact-hash compare
        # is ulp-fragile across engines (DuckDB's quantile_cont agrees
        # to ~1e-12, not bit-exactly). 4 decimals is far finer than any
        # skew decision needs.
        F.round(F.expr("percentile(__cnt, 0.99)"), 4).alias("p99_cnt"),
    )


def freshness(
    df: DataFrame,
    ts_col: str,
    as_of: str,
    warn_after_hours: int = 24,
    error_after_hours: int = 168,
) -> DataFrame:
    """dbt source-freshness analog: newest timestamp vs an `as_of`
    reference ('YYYY-MM-DD HH:MM:SS'), bucketed pass/warn/error.

    `as_of` is an explicit parameter, not now(): freshness checks in a
    scheduled pipeline must be reproducible for a given run timestamp
    (and a cross-engine oracle needs the same instant). One max()
    aggregation — a metadata-cheap full-column scan that parquet
    statistics usually satisfy per row group.
    """
    lag = F.unix_timestamp(F.lit(as_of).cast("timestamp")) - F.unix_timestamp(
        F.max(ts_col)
    )
    status = (
        F.when(lag > error_after_hours * 3600, "error")
        .when(lag > warn_after_hours * 3600, "warn")
        .otherwise("pass")
    )
    return df.agg(
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        lag.alias("lag_seconds"),
        status.alias("status"),
    )


def schema_drift(old_schema, new_schema) -> list[dict]:
    """Structural diff of two StructTypes: added / removed /
    type-changed columns (nested types compared by simpleString).
    Driver-side metadata — the gate an ingestion DAG runs before
    appending a new drop to an existing table (mergeSchema=True hides
    drift; this surfaces it as data, so policy can decide)."""
    old = {f.name: f.dataType.simpleString() for f in old_schema.fields}
    new = {f.name: f.dataType.simpleString() for f in new_schema.fields}
    out: list[dict] = []
    for name in sorted(new.keys() - old.keys()):
        out.append({"column": name, "change": "added", "type": new[name]})
    for name in sorted(old.keys() - new.keys()):
        out.append({"column": name, "change": "removed", "type": old[name]})
    for name in sorted(old.keys() & new.keys()):
        if old[name] != new[name]:
            out.append(
                {
                    "column": name,
                    "change": "type_changed",
                    "type": f"{old[name]} -> {new[name]}",
                }
            )
    return out
