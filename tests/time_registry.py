"""Time every registry query at sf0.01 the way the driver would.

Usage: python tests/time_registry.py [sf_dir] [--oracle] [--driver]
Prints per-query wall seconds (Spark toPandas, plus DuckDB oracle
when --oracle) sorted slowest-first, and the total. With --driver,
imports __spark_entry__ (enabling the table cache and cheapest-first
ordering, exactly as the driver does) instead of the raw registry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    with_oracle = "--oracle" in sys.argv
    as_driver = "--driver" in sys.argv
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if as_driver:
        import __spark_entry__ as entry_mod

        fns = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
    else:
        from data_engineering_hs_spark.queries import REGISTRY, load_all

        load_all()
        fns = {name: q.fn for name, q in REGISTRY.items()}
        oracles = {
            name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None
        }
    sys.path.insert(0, "tests")
    from oracle_harness import run_oracle

    times: dict[str, float] = {}
    t_total = time.time()
    for name, fn in fns.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).toPandas()
            if with_oracle and oracles.get(name):
                run_oracle(oracles[name], sf_dir)
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
