"""Time every registry query at sf0.01 the way the driver would.

Usage: python tests/time_registry.py [sf_dir] [--oracle]
Prints per-query wall seconds (Spark toPandas, plus DuckDB oracle
when --oracle) sorted slowest-first, and the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    with_oracle = "--oracle" in sys.argv
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_hs_spark.queries import REGISTRY, load_all

    load_all()
    sys.path.insert(0, "tests")
    from oracle_harness import run_oracle

    times: dict[str, float] = {}
    t_total = time.time()
    for name, q in REGISTRY.items():
        t0 = time.time()
        try:
            q.fn(spark, sf_dir).toPandas()
            if with_oracle and q.oracle:
                run_oracle(q.oracle, sf_dir)
            times[name] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
    total = round(time.time() - t_total, 1)
    for name, s in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{s:8.2f}  {name}")
    print(json.dumps({"total_sec": total, "n": len(times)}))


if __name__ == "__main__":
    main()
