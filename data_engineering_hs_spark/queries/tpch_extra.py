"""Additional classic OLAP shapes (TPC-H Q6/Q10/Q18 analogs) plus the
MapType function surface — breadth for the relational core."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.functions.scalar import discounted_revenue_cents
from data_engineering_hs_spark.queries.registry import register


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            AS DOUBLE) / 100.0 AS revenue_delta,
       COUNT(*) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: pure predicate scan + single agg — the "
    "filter-pushdown showcase (every predicate reaches the parquet scan)",
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                        "long"
                    )
                ).cast("double")
                / 100.0
            ).alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS DOUBLE) / 100.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue ranking — selective "
    "fact filter + 4-way join + group + top-20",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = discounted_revenue_cents()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg((F.sum(rev).cast("double") / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY total_cents DESC, o.o_orderkey ASC
""",
    doc="TPC-H Q18 shape: large-volume orders — HAVING-derived key set "
    "consumed as a semi-join filter, then re-join + agg",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    big = (
        l.groupBy("l_orderkey").agg(F.sum(qty).alias("sq")).filter(F.col("sq") > 150)
    )
    return (
        o.join(big.select("l_orderkey"), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
        )
        .agg(F.sum(qty).alias("total_qty"))
        .orderBy(F.desc("total_cents"), F.asc("o_orderkey"))
    )


@register(
    "q14_promo_share",
    oracle="""
SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
             THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
             ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
              AS DOUBLE) AS promo_share,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""",
    doc="TPC-H Q14 shape: conditional-revenue ratio over a dim join "
    "(promo share) — exact cents make the ratio deterministic",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = discounted_revenue_cents()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("long"))
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        (F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
            "promo_share"
        ),
        F.count("*").alias("n_lines"),
    )


@register(
    "q4_priority_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS-filtered order counts by priority "
    "(semi-join feeding an aggregate)",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "f_map_ops",
    oracle="""
SELECT l_orderkey, l_linenumber,
       map(['qty', 'disc_pct'],
           [CAST(round(l_quantity) AS BIGINT),
            CAST(round(l_discount * 100) AS BIGINT)])['qty'][1] AS qty_from_map,
       cardinality(map(['qty', 'disc_pct'],
                       [CAST(round(l_quantity) AS BIGINT),
                        CAST(round(l_discount * 100) AS BIGINT)])) AS map_size,
       array_to_string(map_keys(map(['qty', 'disc_pct'],
                                    [CAST(round(l_quantity) AS BIGINT),
                                     CAST(round(l_discount * 100) AS BIGINT)])), ',')
         AS keys_joined
FROM lineitem WHERE l_orderkey <= 500
""",
    doc="MapType surface (F22 map side): map_from_arrays, element_at, "
    "size, map_keys — scalar projections so both engines agree",
)
def f_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("disc_pct")),
        F.array(
            F.round("l_quantity").cast("long"),
            F.round(F.col("l_discount") * 100).cast("long"),
        ),
    )
    return l.filter(F.col("l_orderkey") <= 500).select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_from_map"),
        F.size(m).alias("map_size"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
    )
