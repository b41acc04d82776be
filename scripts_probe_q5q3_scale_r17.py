"""q5/q3 at 10x driver volume (r17, verdict item 6): both queries are
"already minimal plan" at sf0.1 where fixed overhead dominates — this
probe replays the exact same join/agg pipelines over lineitem+orders
replicated 10x (orderkey offset per copy so the l-o join fans
identically; dimensions unchanged, so per-copy results are the sf0.1
results scaled) and reports wall time + the join strategies AQE
actually picks once the fact sides stop fitting broadcast thresholds.

Usage: python scripts_probe_q5q3_scale_r17.py [copies]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.queries.relational import (
    discounted_revenue_cents,
)
from data_engineering_hs_spark.session import get_spark

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="probe_q5q3_scale")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

OFFSET = 100_000_000  # far above any sf0.1 orderkey


def replicate(df: DataFrame, key_cols: list[str]) -> DataFrame:
    c = F.explode(F.array(*[F.lit(i) for i in range(COPIES)])).alias("__copy")
    rep = df.select("*", c)
    for k in key_cols:
        rep = rep.withColumn(k, F.col(k) + F.col("__copy") * OFFSET)
    return rep.drop("__copy")


l = replicate(load_table(spark, SF_DIR, "lineitem"), ["l_orderkey"])
o = replicate(load_table(spark, SF_DIR, "orders"), ["o_orderkey"])
c = load_table(spark, SF_DIR, "customer")
s = load_table(spark, SF_DIR, "supplier")
n = load_table(spark, SF_DIR, "nation")
r = load_table(spark, SF_DIR, "region").filter(F.col("r_name") == "ASIA")
rev = discounted_revenue_cents()


def q5(l, o):
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(rev).cast("double") / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


def q3(l, o):
    cf = c.filter(F.col("c_mktsegment") == "BUILDING")
    of = o.filter(F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date"))
    lf = l.filter(F.to_date("l_shipdate") > F.lit("1995-03-15").cast("date"))
    return (
        lf.join(of, lf.l_orderkey == of.o_orderkey)
        .join(cf, of.o_custkey == cf.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(rev).cast("double") / 100.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


for name, fn in [("q5", q5), ("q3", q3)]:
    df = fn(l, o)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = sorted(
        set(
            re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan
            )
        )
    )
    shuffles = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    print(
        f"{name} x{COPIES}: {dt:.2f}s; joins={joins}; "
        f"shuffle exchanges={shuffles}",
        flush=True,
    )
