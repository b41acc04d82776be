"""ANSI overflow lens (r13, verdict item 3): under ANSI mode —
always on in this engine's session — a 64-bit sum/product overflow
is a JOB-KILLER, not a silent wrap. Each test pins a
100-TB-plausible extreme through the exact expression shape a
production site uses: the widened form must return the correct
value where the naive long form (also pinned) throws
ARITHMETIC_OVERFLOW.

Fixed by this lens:
- key_skew_stats max_share_ppm: 1_000_000 * top1_cnt as a long
  product overflows once the hottest key holds > ~9.2e12 rows
  (100 TB of 10-byte records is 1e13 rows) → DECIMAL(38,0) product
  + DIV (quality/profiling.py).
- t_shuffle_shards id checksum: a per-shard long Σid overflows at
  ~1.2e10 dense doc ids → DECIMAL(38,0) sum reduced mod 1e9+7 so the
  output stays BIGINT (the oracle harness's pandas path degrades
  DECIMAL output columns to float — silent >2^53 rounding).

Audited SAFE by construction (no change needed; bounds in
COVERAGE.md): key_skew_stats sum(cnt*freq) ≤ n_rows; CMS/HLL
counters bounded by event count; funnel 1e6*user-count needs
> 9.2e12 distinct users; _plant_offset max(id)+1 needs id==2^63-1;
pagerank 1e12-quantized checksums bounded by Σrank ≈ 1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestOverflowLens:
    def test_ppm_expression_exact_at_extreme_counts(self, spark):
        # the exact expression key_skew_stats emits (profiling.py)
        top1, n = 9_300_000_000_000, 10_000_000_000_000
        df = spark.createDataFrame([(top1, n)], "top1_cnt long, n_rows long")
        got = df.select(
            F.expr(
                "CAST((CAST(top1_cnt AS DECIMAL(38,0)) * 1000000)"
                " DIV n_rows AS BIGINT)"
            ).alias("ppm")
        ).collect()[0]["ppm"]
        assert got == (top1 * 1_000_000) // n == 930_000
        # the pre-fix long form is an ANSI job-killer at this scale
        with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
            df.select(
                F.floor(F.lit(1_000_000) * F.col("top1_cnt") / F.col("n_rows"))
            ).collect()

    def test_ppm_division_is_floor_exact_not_double_rounded(self, spark):
        # 1e6*t/n in DOUBLE (the old oracle form) rounds above 2^53:
        # t = 2^62-1, n = 2^62 — the exact quotient is
        # 999999.999999999999...(floor 999999) but the double path
        # rounds to exactly 1000000.0 (floor 1000000).
        t = (1 << 62) - 1
        n = 1 << 62
        df = spark.createDataFrame([(t, n)], "top1_cnt long, n_rows long")
        got = df.select(
            F.expr(
                "CAST((CAST(top1_cnt AS DECIMAL(38,0)) * 1000000)"
                " DIV n_rows AS BIGINT)"
            ).alias("ppm")
        ).collect()[0]["ppm"]
        assert got == (t * 1_000_000) // n == 999_999
        assert int(1_000_000 * float(t) / float(n)) == 1_000_000  # double lies

    def test_id_checksum_exact_where_long_sum_overflows(self, spark):
        # the exact expression t_shuffle_shards emits (queries/llm3.py)
        ids = [(1 << 62) - 3, (1 << 62) - 1, (1 << 62) + 5]
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = df.agg(
            F.expr(
                "CAST(SUM(CAST(doc_id AS DECIMAL(38,0))) % 1000000007"
                " AS BIGINT)"
            ).alias("c")
        ).collect()[0]["c"]
        assert got == sum(ids) % 1_000_000_007
        with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
            df.agg(F.sum("doc_id")).collect()

    def test_key_skew_stats_end_to_end_unchanged(self, spark):
        # the widened ppm path returns identical results on normal
        # data (regression guard for the expression swap)
        from data_engineering_hs_spark.quality.profiling import key_skew_stats

        df = spark.createDataFrame(
            [(k,) for k in [1] * 90 + [2] * 9 + [3]], "k int"
        )
        r = key_skew_stats(df, "k").collect()[0]
        assert r["n_keys"] == 3 and r["n_rows"] == 100
        assert r["top1_cnt"] == 90 and r["max_share_ppm"] == 900_000
