#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

One shared SparkSession; each query is timed to full materialization
after a warmup pass. Measurement is INTERLEAVED median-of-5: five
full rounds over the query list, median per query — the SCALE.md
measurement discipline applied to the bench itself. Back-to-back
repeats of one query share any transient load spike, which is how
three consecutive round totals (8.44 / 7.91 / 8.86 s) hid inside a
±25% band; interleaving decorrelates the repeats and the emitted
`round_totals_sec` / `spread_pct` make the remaining noise visible
instead of implied. Stat history: best-of-3 back-to-back through
round 10 (medians read higher than bests on identical code);
median-of-3 interleaved in round 11; median-of-5 from round 12 —
the r11 driver run's 34.7% round spread showed 3 rounds leave the
median hostage to one spike, and the extra two rounds cost ~22 s.
Median-of-5 and median-of-3 estimate the same statistic, so r12+
values remain comparable to r11's (unlike the r10→r11 stat change).
"""

from __future__ import annotations

import json
import os
import time

from data_engineering_hs_spark.queries import REGISTRY, load_all
from data_engineering_hs_spark.session import get_spark


def _cpu_ticks() -> tuple[int, int]:
    """(busy, steal) jiffies from the aggregate /proc/stat cpu line.

    The r16 verdict's ask: this box shows drifting host CPU steal (up
    to 144% of busy time measured in r16), and without a steal
    snapshot in the bench output a judge cannot separate host noise
    from plan regressions. busy = user+nice+system+irq+softirq.
    Returns (0, 0) where /proc/stat is unavailable (non-Linux), so
    the field degrades to steal 0 rather than crashing the bench.
    """
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
        steal = vals[7] if len(vals) > 7 else 0
        return busy, steal
    except (OSError, ValueError, IndexError):
        return 0, 0

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
    busy0, steal0 = _cpu_ticks()

    headline = [name for name, q in sorted(REGISTRY.items()) if q.bench]
    # Warmup pass: parquet footers, codegen, broadcast build — paid
    # once per query, outside every measured window.
    for name in headline:
        REGISTRY[name].fn(spark, sf_dir).count()
    # Five INTERLEAVED rounds: every query once per round, so one
    # load spike lands in at most one of each query's five readings.
    rounds: list[dict[str, float]] = []
    for _ in range(5):
        r: dict[str, float] = {}
        for name in headline:
            t0 = time.perf_counter()
            n = REGISTRY[name].fn(spark, sf_dir).count()
            r[name] = time.perf_counter() - t0
            assert n >= 0
        rounds.append(r)
    timings = {
        name: round(sorted(rd[name] for rd in rounds)[len(rounds) // 2], 4)
        for name in headline
    }
    total = round(sum(timings.values()), 4)
    # the frozen subset must stay INTACT to mean anything round-over-
    # round: a silently shrunken sum would read as a perf win
    missing = [n for n in COMPARABLE_14 if n not in timings]
    assert not missing, f"comparable_14 queries missing from bench: {missing}"
    comparable = round(sum(timings[n] for n in COMPARABLE_14), 4)
    round_totals = [
        round(sum(rd[n] for n in COMPARABLE_14), 4) for rd in rounds
    ]
    spread_pct = round(
        100.0 * (max(round_totals) - min(round_totals)) / comparable, 1
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    busy1, steal1 = _cpu_ticks()
    d_busy, d_steal = busy1 - busy0, steal1 - steal0
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "comparable_14_sec": comparable,
                "stat": "median5_interleaved",
                "round_totals_sec": round_totals,
                "spread_pct": spread_pct,
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # Self-describing fields (additive, r17): the effective
                # master/parallelism prove $SPARK_GRAFT_CPUS was honored
                # (r16's scaling block had to infer it from progress
                # bars), the per-round per-query matrix lets a reader
                # recompute any statistic and see WHICH round a spike
                # hit, and the steal deltas say whether the host was
                # quiet while this bench ran.
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "rounds_queries_sec": [
                    {n: round(t, 4) for n, t in rd.items()} for rd in rounds
                ],
                "host_busy_ticks": d_busy,
                "host_steal_ticks": d_steal,
                "host_steal_pct_of_busy": round(
                    100.0 * d_steal / d_busy, 1
                ) if d_busy > 0 else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
