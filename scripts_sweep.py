"""Full local oracle sweep: run every registry query side-by-side with
its DuckDB oracle at sf0.01, exactly as the driver does. Usage:
    python scripts_sweep.py <chunk_idx> <n_chunks>
    python scripts_sweep.py --names a_mode,t_langid   # explicit subset
Set SWEEP_SF_DIR to sweep another scale (e.g. /root/testdata/sf0.1 —
10x the driver's check; catches size-dependent divergence like cap
boundaries and overflow that sf0.01 never reaches).
Prints one line per query: NAME OK|MISMATCH|ERROR <detail>.
"""
import os
import sys
import time
import traceback

from pyspark.sql import SparkSession

if sys.argv[1] == "--names":
    only_names, chunk_idx, n_chunks = sys.argv[2].split(","), 0, 1
else:
    only_names = None
    chunk_idx, n_chunks = int(sys.argv[1]), int(sys.argv[2])

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "tests")
from data_engineering_hs_spark.queries import load_all

load_all()
from data_engineering_hs_spark.queries import REGISTRY
from oracle_harness import compare_query

names = sorted(REGISTRY.keys()) if only_names is None else only_names
mine = [n for i, n in enumerate(names) if i % n_chunks == chunk_idx]
print(f"chunk {chunk_idx}/{n_chunks}: {len(mine)} queries", flush=True)
bad = 0
for name in mine:
    t0 = time.time()
    try:
        res = compare_query(
            spark, name, os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
        )
        dt = time.time() - t0
        if res:
            bad += 1
            print(f"FAIL {name} ({dt:.1f}s): {res}", flush=True)
        else:
            print(f"OK   {name} ({dt:.1f}s)", flush=True)
    except Exception as e:
        bad += 1
        print(f"ERROR {name}: {e!r}", flush=True)
        traceback.print_exc()
print(f"chunk {chunk_idx}: {bad} failures", flush=True)
