"""revenue_analysis flagship pipeline (SURVEY.md §3.1, fixture B9).

The reference's end-to-end shape (revenue_analysis/main.ipynb):
  1. JSONL (+gz) scan with explicit nested schemas (:153-160)
  2. derive ts/date columns (:204-206)
  3. conditional revenue: when(event='purchase', props.price).otherwise(0)
     (:215-222)
  4. filter dirty rows: revenue >= 0 (~0.1% injected negatives,
     generate_data_json.py:81-82) (:223)
  5. broadcast left joins to items (item_id) and users (user_id == id)
     (:245-252)
  6. daily multi-agg by (date, country, category): events, purchases,
     revenue, distinct buyers (:264-269)
  7. 7-day rolling revenue window per (country, category) (:284-287)
  8. partitioned parquet sink by date + pruned single-date re-read
     (:298, cell cf747d35)

Reusable as a function over any (events, users, items) trio matching
catalog.REVENUE_*_SCHEMA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import (
    REVENUE_EVENTS_SCHEMA,
    REVENUE_ITEMS_SCHEMA,
    REVENUE_USERS_SCHEMA,
)
from data_engineering_hs_spark.sources.json import read_jsonl


def load_inputs(
    spark: SparkSession, events_paths, users_path: str, items_path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    events = read_jsonl(spark, events_paths, REVENUE_EVENTS_SCHEMA)
    users = read_jsonl(spark, users_path, REVENUE_USERS_SCHEMA)
    items = read_jsonl(spark, items_path, REVENUE_ITEMS_SCHEMA)
    return events, users, items


def daily_kpis(events: DataFrame, users: DataFrame, items: DataFrame) -> DataFrame:
    """Steps 2-7: the daily KPI table with 7-day rolling revenue."""
    enriched = (
        events.withColumn("date", F.to_date("ts"))
        .withColumn(
            "revenue",
            F.when(F.col("event") == "purchase", F.col("props.price")).otherwise(0.0),
        )
        .filter(F.col("revenue") >= 0.0)  # dirty-data cleanse
        .join(F.broadcast(items), "item_id", "left")
        .join(
            F.broadcast(users.withColumnRenamed("country", "user_country")),
            events.user_id == users.id,
            "left",
        )
    )
    daily = enriched.groupBy(
        "date", F.col("context.country").alias("country"), "category"
    ).agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event") == "purchase", 1)).alias("n_purchases"),
        F.round(F.sum("revenue"), 2).alias("revenue"),
        F.countDistinct(F.when(F.col("event") == "purchase", F.col("user_id"))).alias(
            "n_buyers"
        ),
    )
    w = Window.partitionBy("country", "category").orderBy("date").rowsBetween(-6, 0)
    return daily.withColumn("revenue_7d", F.round(F.sum("revenue").over(w), 2))


def write_and_prune(
    kpis: DataFrame, out_dir: str, date: str
) -> DataFrame:
    """Steps 8: date-partitioned sink + partition-pruned read-back."""
    kpis.write.mode("overwrite").partitionBy("date").parquet(out_dir)
    spark = kpis.sparkSession
    return spark.read.parquet(out_dir).filter(F.col("date") == date)
