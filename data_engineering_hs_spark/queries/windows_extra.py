"""Window-family and higher-order-function breadth: range frames,
analytic extras (ntile/percent_rank/cume_dist/first/last), and the
user-facing array lambda surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.queries.registry import register


@register(
    "w_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS order_day,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(epoch(o_orderdate) / 86400 AS BIGINT)
         RANGE BETWEEN 365 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_year_cents
FROM orders WHERE o_custkey <= 50
""",
    doc="RANGE-frame window: trailing-365-day spend per customer — the "
    "value-based frame (vs the flagship's ROWS frame)",
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day = (F.unix_timestamp("o_orderdate") / 86400).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-365, Window.currentRow)
    )
    return o.filter(F.col("o_custkey") <= 50).select(
        "o_custkey",
        "o_orderkey",
        day.alias("order_day"),
        F.sum(cents).over(w).alias("trailing_year_cents"),
    )


@register(
    "w_analytic_extras",
    oracle="""
SELECT s_suppkey, s_nationkey,
       NTILE(3) OVER w AS tercile,
       CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
       CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
       FIRST_VALUE(s_suppkey) OVER w AS first_in_nation,
       LAST_VALUE(s_suppkey) OVER (
         PARTITION BY s_nationkey ORDER BY s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_in_nation
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey)
""",
    doc="analytic window extras: ntile, percent_rank, cume_dist, "
    "first/last value (W1 family completion)",
)
def w_analytic_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(3).over(w).alias("tercile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("s_suppkey").over(w).alias("first_in_nation"),
        F.last("s_suppkey").over(w_full).alias("last_in_nation"),
    )


@register(
    "f_higher_order_arrays",
    oracle="""
SELECT p_partkey,
       array_to_string(list_transform(string_split(p_name, ' '),
                                      x -> length(x)), ',') AS word_lens,
       len(list_filter(string_split(p_name, ' '), x -> length(x) > 4))
         AS n_long_words,
       CAST(list_sum(list_transform(string_split(p_name, ' '),
                                    x -> length(x))) AS BIGINT) AS total_chars
FROM part WHERE p_partkey <= 100
""",
    doc="higher-order array lambdas as user surface: transform/filter/"
    "aggregate (F7 family; engine hot paths avoid these — see SCALE.md "
    "— but the API parity with list_transform/list_filter stands). "
    "word_lens is serialized to CSV: the driver's comparer canonicalizes "
    "via pandas sort, which cannot hash array-typed cells.",
)
def f_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.array_join(
            F.transform(words, lambda x: F.length(x).cast("string")), ","
        ).alias("word_lens"),
        F.size(F.filter(words, lambda x: F.length(x) > 4)).alias("n_long_words"),
        F.aggregate(
            F.transform(words, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
    )
