"""Stage-level cost split for the CDC/SCD2 family under load (r17,
verdict item 5). Deterministic synthetic data (hash-derived, no
rand()): base table B rows, changeset C rows, SCD2 stream S events
over K keys. Times each operator via the noop sink (guide §1.4) and
prints the plan skeleton (exchange count / join strategy) so the
SCALE.md entry's claims are reproducible.

Usage: python scripts_profile_cdc_r17.py [base_rows] [change_rows]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F

from data_engineering_hs_spark.operators.cdc import (
    apply_changeset,
    scd2_history,
    snapshot_diff,
)
from data_engineering_hs_spark.session import get_spark

B = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

spark = get_spark(app_name="profile_cdc_r17")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)


def skeleton(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", plan)
    return f"Exchange={plan.count('Exchange ')} joins={sorted(set(joins))}"


base = spark.range(B).select(
    F.col("id").alias("k"),
    F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v1"),
    F.concat(F.lit("row"), F.col("id")).alias("v2"),
)
# changeset: C/2 updates of existing keys, C/4 inserts, C/4 deletes
changes = spark.range(C).select(
    F.when(F.col("id") % 4 == 3, F.col("id") + B)  # inserts beyond base
    .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(B)))
    .alias("k"),
    (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000))).alias("v1"),
    F.concat(F.lit("new"), F.col("id")).alias("v2"),
    F.when(F.col("id") % 4 == 2, F.lit("delete"))
    .when(F.col("id") % 4 == 3, F.lit("insert"))
    .otherwise(F.lit("update"))
    .alias("op"),
).dropDuplicates(["k"])

applied = apply_changeset(base, changes, ["k"])
print("apply_changeset plan:", skeleton(applied))
timed(f"base build alone ({B} rows, noop)", lambda: noop(base))
timed(f"apply_changeset {B} base / ~{C} changes", lambda: noop(applied))

# snapshot_diff: new = base with 1% perturbed values
new = base.withColumn(
    "v1",
    F.when(F.col("k") % 100 == 0, F.col("v1") + 1).otherwise(F.col("v1")),
)
diff = snapshot_diff(base, new, ["k"])
print("snapshot_diff plan:", skeleton(diff))
timed(f"snapshot_diff {B} vs {B}", lambda: noop(diff))

# scd2: S = B/5 events over K = B/50 keys, ~10 events/key
S, K = B // 5, B // 50
stream = spark.range(S).select(
    F.pmod(F.col("id"), F.lit(K)).alias("k"),
    F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("ts"),
    F.pmod(F.xxhash64("id"), F.lit(5)).alias("status"),
)
hist = scd2_history(stream, "k", ["status"], "ts")
print("scd2 plan:", skeleton(hist))
timed(f"scd2_history {S} events / {K} keys", lambda: noop(hist))
