"""Interleaved A/B of the adaptive input rebalance (catalog.py r16):
A = rebalance disabled (SPARK_GRAFT_REBALANCE_MIN_BYTES=-1),
B = rebalance on (default 256 KiB floor).

One session, A B A B ... per query so host-load noise lands on both
arms equally (the SCALE.md measurement discipline). Usage:
    python scripts_ab_rebalance.py [reps] [name1,name2,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from data_engineering_hs_spark.queries import REGISTRY, load_all
from data_engineering_hs_spark.session import get_spark

load_all()

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
names = (
    sys.argv[2].split(",")
    if len(sys.argv) > 2
    else sorted(n for n, q in REGISTRY.items() if q.bench)
)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="ab_rebalance")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()


def run(name: str, rebalance: bool) -> float:
    os.environ["SPARK_GRAFT_REBALANCE_MIN_BYTES"] = (
        str(256 * 1024) if rebalance else "-1"
    )
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf_dir).count()
    return time.perf_counter() - t0


med = lambda xs: sorted(xs)[len(xs) // 2]
tot_a, tot_b = 0.0, 0.0
for name in names:
    run(name, False)
    run(name, True)  # warm both plans
    a, b = [], []
    for _ in range(reps):
        a.append(run(name, False))
        b.append(run(name, True))
    ma, mb = med(a), med(b)
    tot_a += ma
    tot_b += mb
    print(
        f"{name}: off {ma:.3f}s on {mb:.3f}s ({100 * (mb / ma - 1):+.1f}%)",
        flush=True,
    )
print(f"TOTAL: off {tot_a:.3f}s on {tot_b:.3f}s ({100 * (tot_b / tot_a - 1):+.1f}%)")
