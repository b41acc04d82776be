"""Stage-level cost split for the graph family under load (r17,
verdict item 5: the only operator families with zero perf evidence).

Synthetic deterministic graph (hash-derived edges — no rand(), so
re-runs and retries see identical data): N nodes, ~E edges. Measures:

  * pagerank: invariant-checkpoint phase vs per-iteration cost
    (iterations k in {1, 3, 5} — the slope is the per-round cost, the
    intercept is the setup), via the noop sink (guide §1.4).
  * label_propagation: same split.

Usage: python scripts_profile_graph_r17.py [n_nodes] [avg_degree]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F

from data_engineering_hs_spark.operators.graph import (
    label_propagation,
    pagerank,
)
from data_engineering_hs_spark.session import get_spark

n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 10

spark = get_spark(app_name="profile_graph_r17")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()


def edges_df():
    # deterministic scatter: edge i connects (i mod N) -> xxhash-spread
    # destination; multi-edges and self-loops possible, as in real logs
    n_edges = n_nodes * avg_deg
    return (
        spark.range(n_edges)
        .select(
            F.pmod(F.col("id"), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return dt


e = edges_df()
timed("edge build alone (noop)", lambda: noop(e))

for k in (1, 3, 5):
    spark.sparkContext.setJobDescription(f"pagerank k={k}")
    timed(f"pagerank iterations={k}", lambda k=k: noop(pagerank(e, iterations=k)))

for k in (1, 3, 5):
    spark.sparkContext.setJobDescription(f"label_prop k={k}")
    timed(
        f"label_propagation rounds={k}",
        lambda k=k: noop(label_propagation(e, iterations=k)),
    )
spark.sparkContext.setJobDescription(None)
