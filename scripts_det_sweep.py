"""Partitioning-determinism sweep: every registry query at sf0.01
under spark.sql.shuffle.partitions=3 and =17; canonicalized results
must be identical. Catches collect-order / float-merge-order
nondeterminism BEFORE the driver does (its parallelism differs from
the local sweep's).
Usage:
    python scripts_det_sweep.py <chunk_idx> <n_chunks>
    python scripts_det_sweep.py --names a_mode,t_langid   # explicit subset
"""
import sys
import time

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
sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from data_engineering_hs_spark.queries import load_all

load_all()
from data_engineering_hs_spark.queries import REGISTRY
from oracle_harness import _canon_df

SF = "/root/testdata/sf0.01"
names = sorted(REGISTRY.keys()) if only_names is None else only_names
mine = [n for i, n in enumerate(names) if i % n_chunks == chunk_idx]
print(f"chunk {chunk_idx}/{n_chunks}: {len(mine)} queries", flush=True)
bad = 0
for name in mine:
    t0 = time.time()
    try:
        outs = []
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            outs.append(_canon_df(REGISTRY[name].fn(spark, SF).toPandas()))
        dt = time.time() - t0
        if outs[0] != outs[1]:
            bad += 1
            print(f"NONDET {name} ({dt:.1f}s)", flush=True)
        else:
            print(f"OK     {name} ({dt:.1f}s)", flush=True)
    except Exception as e:
        bad += 1
        print(f"ERROR  {name}: {e!r}", flush=True)
print(f"chunk {chunk_idx}: {bad} nondeterministic/errors", flush=True)
