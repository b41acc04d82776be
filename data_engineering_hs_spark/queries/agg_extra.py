"""Aggregation-surface extras: ordered string aggregation, exact
statistical moments, ratio-to-report."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.functions.scalar import money_cents
from data_engineering_hs_spark.queries.registry import register


@register(
    "a_string_agg",
    oracle="""
SELECT c_mktsegment,
       string_agg(substring(c_name, 1, 12), ',' ORDER BY c_name) AS names_joined,
       COUNT(*) AS n
FROM customer WHERE c_custkey <= 60
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    doc="ordered string aggregation (LISTAGG/string_agg) — "
    "collect_list + array_sort + array_join in Spark",
)
def a_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") <= 60)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.substring("c_name", 1, 12))), ","
            ).alias("names_joined"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "a_stats_moments",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(c) AS DOUBLE) / COUNT(*) / 100.0 AS mean_price,
       (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(c2) AS DOUBLE)
        - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
       / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0))
       / 10000.0 AS var_price
FROM (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_extendedprice * 100) AS BIGINT) AS c2
  FROM lineitem
) GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="statistical moments (mean/sample variance) from EXACT integer "
    "sum/sum-of-squares — deterministic across engines and "
    "partitionings, unlike builtin stddev's streaming formulas",
)
def a_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    c = money_cents("l_extendedprice")
    base = l.select("l_returnflag", c.alias("c"), (c * c).alias("c2"))
    n = F.count("*").cast("double")
    s = F.sum("c").cast("double")
    s2 = F.sum("c2").cast("double")
    return (
        base.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            (s / n / 100.0).alias("mean_price"),
            ((n * s2 - s * s) / (n * (n - 1.0)) / 10000.0).alias("var_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "w_share_of_total",
    oracle="""
WITH agg AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER () AS DOUBLE) AS share
FROM agg ORDER BY o_orderpriority
""",
    doc="ratio-to-report: per-group share of the grand total via an "
    "empty-over window (exact cents → deterministic division)",
)
def w_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.sum(money_cents("o_totalprice")).alias("cents")
    )
    w = Window.partitionBy()
    return agg.select(
        "o_orderpriority",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (
            F.col("cents").cast("double") / F.sum("cents").over(w).cast("double")
        ).alias("share"),
    ).orderBy("o_orderpriority")
