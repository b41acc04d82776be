"""Interleaved A/B of the r17 d_minhash_lsh probes.

A = the pre-r17 shape, reproduced inline: band bucket = xxhash64 of a
comma-joined STRING of the band's signature slice, pair dedup on a
hash exchange, then a separate range exchange for the orderBy.
B arms:
  --only-bandhash  xxhash64 directly over the r signature LONGS
                   (the shipped r17 change) — measured -2.5%.
  --only-fusion    pair dedup on a range partitioning the orderBy
                   reuses (4 exchanges -> 3) — measured +5.4%,
                   REJECTED: repartitionByRange's range-bound sampling
                   re-evaluates the pair pipeline and costs more than
                   the exchange it saves.
  (default: both combined — measured -0.9%, consistent with the two.)

Asserts full-frame value identity FIRST (pair outputs must be
bit-identical — bucket values differ by design, membership must not),
then times the whole declared query (pairs + orderBy + count)
A B A B ... in one session. Usage:
python scripts_ab_minhash_r17.py [reps] [--only-bandhash|--only-fusion]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.operators.dedup import (
    _pairs_from_banded,
    minhash_signatures,
)
from data_engineering_hs_spark.session import get_spark

NUM_HASHES, BANDS, SHINGLE_K, MAX_BUCKET = 32, 8, 3, 1000


def banded_old(d: DataFrame) -> DataFrame:
    """Pre-r17 lsh_band_buckets, verbatim (string concat band hash)."""
    r = NUM_HASHES // BANDS
    sigs = minhash_signatures(
        d, "text", "doc_id", NUM_HASHES, SHINGLE_K, include_missing=False
    )
    band_buckets = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("signature", b * r + j + 1).cast("string")
                        for j in range(r)
                    ],
                ),
                F.lit(b),
            )
            for b in range(BANDS)
        ]
    )
    return sigs.select(
        F.col("doc_id"), F.posexplode(band_buckets).alias("band", "bucket")
    )


def banded_new(d: DataFrame) -> DataFrame:
    """r17 lsh_band_buckets, verbatim (direct long band hash)."""
    r = NUM_HASHES // BANDS
    sigs = minhash_signatures(
        d, "text", "doc_id", NUM_HASHES, SHINGLE_K, include_missing=False
    )
    band_buckets = F.array(
        *[
            F.xxhash64(
                *[F.element_at("signature", b * r + j + 1) for j in range(r)],
                F.lit(b),
            )
            for b in range(BANDS)
        ]
    )
    return sigs.select(
        F.col("doc_id"), F.posexplode(band_buckets).alias("band", "bucket")
    )


def _pairs_range_dedup(banded: DataFrame) -> DataFrame:
    """The REJECTED fusion arm, inline: dedup on a range partitioning
    of (id_a, id_b) so the follow-up orderBy adds no exchange."""
    from data_engineering_hs_spark.operators.dedup import _array_pairs

    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("truncated", F.size("ids") > MAX_BUCKET)
        .withColumn("ids", F.slice("ids", 1, MAX_BUCKET))
    )
    pairs = _array_pairs(
        buckets,
        "ids",
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")),
        ["truncated"],
    )
    flat = pairs.select(
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
        "truncated",
    ).repartitionByRange("id_a", "id_b")
    return flat.groupBy("id_a", "id_b").agg(
        F.max("truncated").alias("truncated")
    )


def q_old(d: DataFrame) -> DataFrame:
    return _pairs_from_banded(banded_old(d), "doc_id", MAX_BUCKET).orderBy(
        "id_a", "id_b"
    )


def q_new(d: DataFrame) -> DataFrame:
    return _pairs_range_dedup(banded_new(d)).orderBy("id_a", "id_b")


def q_bandhash_only(d: DataFrame) -> DataFrame:
    return _pairs_from_banded(banded_new(d), "doc_id", MAX_BUCKET).orderBy(
        "id_a", "id_b"
    )


def q_fusion_only(d: DataFrame) -> DataFrame:
    return _pairs_range_dedup(banded_old(d)).orderBy("id_a", "id_b")


reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 7
if "--only-bandhash" in sys.argv:
    arm_b, label = q_bandhash_only, "bandhash-only"
elif "--only-fusion" in sys.argv:
    arm_b, label = q_fusion_only, "fusion-only"
else:
    arm_b, label = q_new, "both"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_minhash_r17")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

d = load_table(spark, sf_dir, "documents", scan_parallel_key="doc_id")
old_rows = [tuple(r) for r in q_old(d).collect()]
new_rows = [tuple(r) for r in arm_b(d).collect()]
assert old_rows == new_rows, (
    f"value mismatch: {len(old_rows)} vs {len(new_rows)} rows"
)
print(f"values identical ({len(old_rows)} ordered pairs)", flush=True)


def run(fn) -> float:
    t0 = time.perf_counter()
    fn(d).count()
    return time.perf_counter() - t0


run(q_old)
run(arm_b)  # warm both plans
a, b_ = [], []
for _ in range(reps):
    a.append(run(q_old))
    b_.append(run(arm_b))
med = lambda xs: sorted(xs)[len(xs) // 2]
ma, mb = med(a), med(b_)
print(f"old {ma:.3f}s {label} {mb:.3f}s ({100 * (mb / ma - 1):+.1f}%)")
print("old reps:", [round(x, 3) for x in a])
print("new reps:", [round(x, 3) for x in b_])
