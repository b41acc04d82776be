"""Approximate-aggregate determinism contracts (r14, from the r15
candidate queue).

Measured facts (sf0.01 lineitem, partitions 3/17/64):
- approx_count_distinct is PARTITIONING-INDEPENDENT (HLL++ merge is
  associative and commutative — byte-identical estimates at every
  layout) and within rsd of exact. Safe to emit raw... but the
  registry still folds it into a tolerance boolean, which is the
  right posture anyway.
- percentile_approx is PARTITIONING-DEPENDENT (52954.27 / 52976.40 /
  52972.32 at 3/17/64 partitions for the same p50) — the sketch
  merge is order-sensitive. A registry row emitting its raw value
  would flake the moment the driver's parallelism differs from the
  sweep's. a_approx_quantiles therefore emits exact percentiles plus
  sketch-within-tolerance BOOLEANS; this file pins the facts so that
  shield is never "simplified" into raw emission.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF001


class TestApproxAggContracts:
    def test_approx_count_distinct_partitioning_independent(self, spark):
        li = spark.read.parquet(f"{SF001}/lineitem.parquet")
        exact = li.select("l_orderkey").distinct().count()
        estimates = []
        for parts in (3, 17, 64):
            r = (
                li.repartition(parts)
                .agg(
                    F.approx_count_distinct("l_orderkey").alias("d"),
                    F.approx_count_distinct("l_orderkey", 0.01).alias("d1"),
                )
                .collect()[0]
            )
            estimates.append((r["d"], r["d1"]))
        assert estimates[0] == estimates[1] == estimates[2], estimates
        d, d1 = estimates[0]
        # default rsd 0.05, tight rsd 0.01 — allow 3x rsd slack
        assert abs(d - exact) <= 3 * 0.05 * exact, (d, exact)
        assert abs(d1 - exact) <= 3 * 0.01 * exact, (d1, exact)

    def test_percentile_approx_tolerance_holds_across_layouts(self, spark):
        # the raw estimate is layout-dependent (see module docstring);
        # the CONTRACT a consumer may rely on is exact-within-
        # tolerance at any layout — assert exactly that at three
        # layouts, never raw-value stability
        li = spark.read.parquet(f"{SF001}/lineitem.parquet")
        exact = li.agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p")
        ).collect()[0]["p"]
        for parts in (3, 17, 64):
            est = (
                li.repartition(parts)
                .agg(
                    F.percentile_approx(
                        "l_extendedprice", F.lit(0.5), F.lit(1000)
                    ).alias("p")
                )
                .collect()[0]["p"]
            )
            assert abs(est - exact) <= 0.01 * exact, (parts, est, exact)
