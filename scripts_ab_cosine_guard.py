"""Interleaved A/B of cosine_from's non-finite guard on s_cosine_topk.

r14 driver read put s_cosine_topk at 0.721 s (+30.8 % vs r13) while
the arrow twin — same guard — got 5 % FASTER; the builder's controls
put it at 0.61 s. This script adjudicates under the repo's two-run
rule: run the query at sf0.1 with the shipped guard (A) and with the
guard compiled out (B), strictly interleaved A B A B ... in ONE
session, and report medians. If A ≈ B the +31 % was box noise; if
A ≫ B the guard is real cost on the fold path and needs restructuring.

Usage: python scripts_ab_cosine_guard.py [reps=7]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_engineering_hs_spark.functions import vector
from data_engineering_hs_spark.operators import similarity
from data_engineering_hs_spark.session import get_spark


def _unguarded_cosine_from(d: Column, norm_a: Column, norm_b: Column) -> Column:
    # the pre-r14 form: zero-norm CASE only, no non-finite guard
    nn = norm_a * norm_b
    return F.when(nn == 0, F.lit(0.0)).otherwise(d / nn)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark()
    import __spark_entry__ as entry

    q = entry.queries()["s_cosine_topk"]

    guarded = vector.cosine_from

    def set_impl(fn):
        # similarity.py binds the name at import (`from ... import
        # cosine_from`), so patch BOTH the source module and the bound
        # reference the query path actually calls
        vector.cosine_from = fn
        similarity.cosine_from = fn

    def run() -> float:
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        return time.perf_counter() - t0

    # warm-up (JVM, parquet footer cache) — one of each, untimed
    run()
    set_impl(_unguarded_cosine_from)
    run()
    set_impl(guarded)

    a_times: list[float] = []
    b_times: list[float] = []
    for i in range(reps):
        set_impl(guarded)
        a_times.append(run())
        set_impl(_unguarded_cosine_from)
        b_times.append(run())
    set_impl(guarded)

    ma, mb = statistics.median(a_times), statistics.median(b_times)
    print(f"A (guarded)   reps={reps}: {[round(t, 3) for t in a_times]} median={ma:.3f}s")
    print(f"B (unguarded) reps={reps}: {[round(t, 3) for t in b_times]} median={mb:.3f}s")
    print(f"guard overhead: {100 * (ma - mb) / mb:+.1f}%")


if __name__ == "__main__":
    main()
