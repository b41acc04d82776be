"""Model-DAG runner wired into the correctness gate: a staging→mart
pipeline over the testdata tables, executed by plans.model_dag with
dbt-style checks, whose mart output is DuckDB-oracle-checked (S29 in
the oracle gate, not just unit tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.plans.model_dag import ModelContext, ModelRunner
from data_engineering_hs_spark.quality.assertions import expect_not_null, expect_unique
from data_engineering_hs_spark.queries.registry import register

M_FCT_ORACLE = """
WITH stg_orders AS (
  SELECT o_orderkey, o_custkey, lower(o_orderstatus) AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders
), li AS (
  SELECT l_orderkey,
         COUNT(*) AS n_items,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS lineitem_cents
  FROM lineitem GROUP BY l_orderkey
)
SELECT s.o_orderkey, s.status, s.total_cents,
       COALESCE(li.n_items, 0) AS n_items,
       COALESCE(li.lineitem_cents, 0) AS lineitem_cents,
       s.total_cents - COALESCE(li.lineitem_cents, 0) AS residual_cents
FROM stg_orders s LEFT JOIN li ON s.o_orderkey = li.l_orderkey
"""


@register(
    "m_fct_order_totals",
    oracle=M_FCT_ORACLE,
    doc="dbt-style model DAG (S29) in the oracle gate: raw → staging "
    "cast/normalize → mart joining a pre-aggregated side, with "
    "not_null/unique checks gating the run like `dbt test`",
)
def m_fct_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    runner = ModelRunner(
        spark,
        sources={
            "orders": load_table(spark, sf_dir, "orders"),
            "lineitem": load_table(spark, sf_dir, "lineitem"),
        },
    )

    @runner.model(
        "stg_orders_t",
        checks=[
            lambda df: expect_not_null(df, "o_orderkey", "stg_orders_t"),
            lambda df: expect_unique(df, "o_orderkey", "stg_orders_t"),
        ],
    )
    def stg_orders_t(ctx: ModelContext) -> DataFrame:
        o = ctx.source("orders")
        return o.select(
            "o_orderkey",
            "o_custkey",
            F.lower("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
        )

    @runner.model("stg_lineitem_agg")
    def stg_lineitem_agg(ctx: ModelContext) -> DataFrame:
        l = ctx.source("lineitem")
        cents = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long")
        return l.groupBy("l_orderkey").agg(
            F.count("*").alias("n_items"),
            F.sum(cents).alias("lineitem_cents"),
        )

    @runner.model(
        "fct_order_totals",
        checks=[lambda df: expect_unique(df, "o_orderkey", "fct_order_totals")],
    )
    def fct_order_totals(ctx: ModelContext) -> DataFrame:
        s = ctx.ref("stg_orders_t")
        li = ctx.ref("stg_lineitem_agg")
        return s.join(li, s.o_orderkey == li.l_orderkey, "left").select(
            "o_orderkey",
            "status",
            "total_cents",
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
            F.coalesce("lineitem_cents", F.lit(0).cast("long")).alias(
                "lineitem_cents"
            ),
            (
                F.col("total_cents")
                - F.coalesce("lineitem_cents", F.lit(0).cast("long"))
            ).alias("residual_cents"),
        )

    return runner.run(["fct_order_totals"])["fct_order_totals"]


_MV_MEASURES = {
    "qty_c": ("sum", "CAST(round(l_quantity * 100) AS BIGINT)"),
    "n_items": ("count", "*"),
    "min_price": ("min", "l_extendedprice"),
    "max_price": ("max", "l_extendedprice"),
}


@register(
    "m_incremental_mv",
    # The MV is built as TWO committed increments of partial states
    # (ship dates before/after 1995) merged at read time; the oracle
    # is the one-shot full aggregate — partial-state merge must be
    # indistinguishable from recomputation. Sums ride on exact
    # scaled BIGINTs; min/max of raw doubles are exact (no float
    # accumulation near the hash).
    oracle="""
SELECT l_suppkey,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
""",
    doc="incremental materialized-view maintenance: per-supplier "
    "rollup kept fresh by appending per-increment PARTIAL aggregate "
    "states to a key-bucketed store and merging at read — each "
    "refresh shuffles one increment, never history, and the final "
    "merge reads Exchange-free off the bucketing (plan-asserted in "
    "tests/test_scale_ops.py)",
)
def m_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_hs_spark.operators import incremental as I

    li = load_table(spark, sf_dir, "lineitem")
    inc1 = li.filter(F.col("l_shipdate") < "1995-01-01")
    inc2 = li.filter(F.col("l_shipdate") >= "1995-01-01")
    I.commit_increment(
        I.partial_aggs(inc1, ["l_suppkey"], _MV_MEASURES),
        "mv_supp_rev",
        ["l_suppkey"],
        overwrite=True,
    )
    I.commit_increment(
        I.partial_aggs(inc2, ["l_suppkey"], _MV_MEASURES),
        "mv_supp_rev",
        ["l_suppkey"],
    )
    return I.materialize(
        spark, "mv_supp_rev", ["l_suppkey"], _MV_MEASURES
    ).orderBy("l_suppkey")
