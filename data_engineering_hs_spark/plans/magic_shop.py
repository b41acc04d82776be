"""magic_shop model DAG — reference-parity pipeline on the runner.

Re-expresses the dbt project at
/root/reference/lab04-mini-lab-databases/clickhouse/magic_shop/models:
  raw.{customers,orders,payments}
  → stg_customers (initcap names, ifNull house, casts — stg_customers.sql:3-9)
  → stg_orders    (toInt32/toDateTime/lower(status)/toDecimal64 — stg_orders.sql:3-10)
  → stg_payments  (lower(method), toDecimal64 — stg_payments.sql:3-9)
  → dim_customers (full_name concat — dim_customers.sql:9)
  → fct_orders    (left join pre-aggregated payments, outstanding =
                   amount - ifNull(paid,0), 30-day incremental window,
                   delete+insert on order_id, partition toYYYYMM —
                   fct_orders.sql:9-46)
plus the schema.yml tests (not_null/unique/accepted_values, :6-28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_hs_spark.functions.scalar import month_bucket
from data_engineering_hs_spark.plans.model_dag import ModelContext, ModelRunner
from data_engineering_hs_spark.quality.assertions import (
    expect_accepted_values,
    expect_not_null,
    expect_unique,
)

ORDER_STATUSES = ["fulfilled", "returned", "pending", "cancelled"]


def build_runner(
    spark: SparkSession,
    raw: dict[str, DataFrame],
    warehouse_dir: str | None = None,
    now_expr: str = "current_timestamp()",
) -> ModelRunner:
    """raw must contain 'customers', 'orders', 'payments' (stringly
    typed, FIXTURES.md §B6). `now_expr` is injectable so tests can pin
    the incremental window's 'now' (fct_orders.sql:24 uses now())."""
    runner = ModelRunner(spark, raw, warehouse_dir)

    @runner.model(
        "stg_customers",
        materialization="table" if warehouse_dir else "view",
        checks=[
            lambda df: expect_not_null(df, "customer_id", "stg_customers"),
            lambda df: expect_unique(df, "customer_id", "stg_customers"),
        ],
    )
    def stg_customers(ctx: ModelContext) -> DataFrame:
        return ctx.source("customers").select(
            F.col("customer_id").cast("int").alias("customer_id"),
            F.initcap("first_name").alias("first_name"),
            F.initcap("last_name").alias("last_name"),
            F.coalesce(F.col("house"), F.lit("Unknown")).alias("house"),
            F.to_date("signup_date").alias("signup_date"),
        )

    @runner.model(
        "stg_orders",
        materialization="table" if warehouse_dir else "view",
        checks=[
            lambda df: expect_not_null(df, "order_id", "stg_orders"),
            lambda df: expect_unique(df, "order_id", "stg_orders"),
            lambda df: expect_not_null(df, "customer_id", "stg_orders"),
            lambda df: expect_accepted_values(
                df, "status", ORDER_STATUSES, "stg_orders"
            ),
        ],
    )
    def stg_orders(ctx: ModelContext) -> DataFrame:
        return ctx.source("orders").select(
            F.col("order_id").cast("int").alias("order_id"),
            F.col("customer_id").cast("int").alias("customer_id"),
            F.to_timestamp("order_ts").alias("order_ts"),
            F.col("item"),
            F.lower("status").alias("status"),
            F.col("amount_galleons").cast("decimal(12,2)").alias("amount_galleons"),
        )

    @runner.model(
        "stg_payments",
        materialization="table" if warehouse_dir else "view",
    )
    def stg_payments(ctx: ModelContext) -> DataFrame:
        return ctx.source("payments").select(
            F.col("payment_id").cast("int").alias("payment_id"),
            F.col("order_id").cast("int").alias("order_id"),
            F.lower("method").alias("method"),
            F.col("paid_galleons").cast("decimal(12,2)").alias("paid_galleons"),
            F.to_timestamp("paid_at").alias("paid_at"),
        )

    @runner.model("dim_customers")
    def dim_customers(ctx: ModelContext) -> DataFrame:
        c = ctx.ref("stg_customers")
        return c.select(
            "customer_id",
            F.concat_ws(" ", "first_name", "last_name").alias("full_name"),
            "house",
            "signup_date",
        )

    @runner.model(
        "fct_orders",
        materialization="incremental" if warehouse_dir else "view",
        unique_key="order_id",
        partition_by="order_month",
        checks=[
            lambda df: expect_not_null(df, "order_id", "fct_orders"),
            lambda df: expect_unique(df, "order_id", "fct_orders"),
            lambda df: expect_not_null(df, "outstanding_galleons", "fct_orders"),
        ],
    )
    def fct_orders(ctx: ModelContext) -> DataFrame:
        orders = ctx.ref("stg_orders")
        if ctx.is_incremental:
            # fct_orders.sql:22-25: only reprocess the 30-day window.
            orders = orders.filter(
                F.col("order_ts") >= F.expr(f"{now_expr} - INTERVAL 30 DAYS")
            )
        pay = (
            ctx.ref("stg_payments")
            .groupBy("order_id")
            .agg(F.sum("paid_galleons").alias("total_paid"))
        )
        return (
            orders.join(pay, "order_id", "left")
            .select(
                "order_id",
                "customer_id",
                "order_ts",
                month_bucket("order_ts").alias("order_month"),
                "item",
                "status",
                "amount_galleons",
                F.coalesce(
                    F.col("total_paid"), F.lit(0).cast("decimal(12,2)")
                ).alias("paid_galleons"),
                (
                    F.col("amount_galleons")
                    - F.coalesce(F.col("total_paid"), F.lit(0).cast("decimal(12,2)"))
                ).alias("outstanding_galleons"),
            )
        )

    return runner
