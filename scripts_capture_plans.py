"""Capture .explain("formatted") for headline (or named) queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence
trail (the judge reads these instead of running Spark).

Usage:
    python scripts_capture_plans.py <tag> <suffix> [name1,name2,...]
e.g.
    python scripts_capture_plans.py r16 before
    python scripts_capture_plans.py r16 after s_bm25_topk,d_minhash_lsh
"""

import io
import contextlib
import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from data_engineering_hs_spark.queries import REGISTRY, load_all
from data_engineering_hs_spark.session import get_spark

load_all()

tag = sys.argv[1]
suffix = sys.argv[2]
names = (
    sys.argv[3].split(",")
    if len(sys.argv) > 3
    else sorted(n for n, q in REGISTRY.items() if q.bench)
)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name=f"plans_{tag}_{suffix}")
spark.sparkContext.setLogLevel("ERROR")
out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", tag)
os.makedirs(out_dir, exist_ok=True)

for name in names:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    n_exchange = txt.count("Exchange")
    joins = [
        j
        for j in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
        if j in txt
    ]
    py = [
        p
        for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas")
        if p in txt
    ]
    print(f"{name}: Exchange={n_exchange} joins={joins} python={py} -> {path}", flush=True)
