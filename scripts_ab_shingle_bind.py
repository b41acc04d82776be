"""Interleaved A/B: lambda-binding tokens() in word_shingle_seq, on
d_minhash_lsh at sf0.1 (r16 verdict item 4, timeboxed).

The hypothesis (the r15 cosine lesson generalized): word_shingle_seq
references `tokens(c)` — a full `\\s+` regex split + non-empty filter
over the multi-KB text — k+3 times in its expression tree (the
zip_with seed, each per-j slice argument, and every F.size(n) use),
and zip_with/slice-in-HOF are CodegenFallback with no subtree CSE,
so the split may re-execute per reference per row. Variant B binds
the token array ONCE as a 1-element `transform` lambda variable
(exactly the cosine_from/stable_round single-evaluation shape) and
builds the same shingle expression from the bound variable.

Output values are bit-identical by construction (same operations on
the same materialized array — asserted on sf0.01 before timing).

Usage: python scripts_ab_shingle_bind.py [reps=7]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_engineering_hs_spark.functions import text as TX
from data_engineering_hs_spark.session import get_spark

_orig_word_shingle_seq = TX.word_shingle_seq


def _bound_word_shingle_seq(c, k: int = 3) -> Column:
    if k < 1:
        raise ValueError(f"shingle width k must be >= 1 (got {k})")

    def build(toks: Column) -> Column:
        n = F.size(toks)
        sh = toks
        for j in range(1, k):
            sh = F.zip_with(
                sh,
                F.slice(toks, j + 1, F.greatest(n - j, F.lit(0))),
                lambda acc, t: F.concat_ws(" ", acc, t),
            )
        sh = F.slice(sh, 1, F.greatest(n - k + 1, F.lit(0)))
        return F.when(n >= k, sh).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(TX.tokens(c)), build), 1)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    q = entry.queries()["d_minhash_lsh"]

    def set_impl(fn):
        TX.word_shingle_seq = fn

    # value-identity check at sf0.01 BEFORE timing anything
    set_impl(_orig_word_shingle_seq)
    a_rows = sorted(map(tuple, q(spark, "/root/testdata/sf0.01").collect()))
    set_impl(_bound_word_shingle_seq)
    b_rows = sorted(map(tuple, q(spark, "/root/testdata/sf0.01").collect()))
    assert a_rows == b_rows, (
        f"VALUE DIVERGENCE: {len(a_rows)} vs {len(b_rows)} rows"
    )
    print(f"value identity OK at sf0.01 ({len(a_rows)} pairs)")

    sf_dir = "/root/testdata/sf0.1"

    def run() -> float:
        t0 = time.perf_counter()
        q(spark, sf_dir).count()
        return time.perf_counter() - t0

    # warm-up, one of each, untimed
    set_impl(_orig_word_shingle_seq)
    run()
    set_impl(_bound_word_shingle_seq)
    run()

    a_times: list[float] = []
    b_times: list[float] = []
    for _ in range(reps):
        set_impl(_orig_word_shingle_seq)
        a_times.append(run())
        set_impl(_bound_word_shingle_seq)
        b_times.append(run())
    set_impl(_orig_word_shingle_seq)

    ma, mb = statistics.median(a_times), statistics.median(b_times)
    print(f"A (current) reps={reps}: {[round(t, 3) for t in a_times]} median={ma:.3f}s")
    print(f"B (bound)   reps={reps}: {[round(t, 3) for t in b_times]} median={mb:.3f}s")
    print(f"bound vs current: {100 * (mb - ma) / ma:+.1f}%")


if __name__ == "__main__":
    main()
