"""Round-8 LLM-pipeline additions: deterministic shuffle-sharding for
training data loaders and SemDeDup cluster-scoped semantic dedup.

Same oracle discipline as llm/llm2: md5 is the cross-engine hash
bridge (bit-identical hex in Spark and DuckDB); float-driven
decisions stay engine-side and are emitted through the planted-audit
pattern (integer counts + guarantee booleans, never raw doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.operators import similarity as S
from data_engineering_hs_spark.queries.llm import _plant_offset, _shift_ids
from data_engineering_hs_spark.queries.registry import register


@register(
    "t_shuffle_shards",
    # Per-shard rollup of the deterministic shuffle: counts, id sums,
    # and the first/last doc in shuffle-key order within each shard.
    # md5 hex compares identically in both engines and keys are
    # unique per id, so arg_min/arg_max are unambiguous.
    oracle="""
WITH k AS (
  SELECT doc_id,
         md5('v1:' || CAST(doc_id AS VARCHAR)) AS key,
         CAST(CAST(concat('0x', substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) % 8 AS INT) AS shard
  FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(doc_id) % 1000000007 AS BIGINT) AS id_checksum,
       arg_min(doc_id, key) AS first_id,
       arg_max(doc_id, key) AS last_id
FROM k GROUP BY shard ORDER BY shard
""",
    doc="deterministic global shuffle + shard assignment for training "
    "data loaders: md5(seed:id) ordering, hash-bucketed shards, one "
    "shuffle + per-shard local sort (no global range exchange) — "
    "reproducible across runs, partitionings, and engines",
)
def t_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_hs_spark.operators.corpus import shuffle_shards

    d = load_table(spark, sf_dir, "documents")
    sh = shuffle_shards(d, "doc_id", n_shards=8, seed="v1")
    return (
        sh.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            # Mod-prime content checksum (r13 overflow lens): a plain
            # long Σid overflows ANSI once Σid > 2^63 — with dense ids
            # that is only ~1.2e10 docs, squarely 100-TB-plausible.
            # Sum in DECIMAL(38,0) (exact 128-bit; DuckDB sums BIGINT
            # in HUGEINT natively), reduce mod 1e9+7 so the OUTPUT
            # stays BIGINT — the oracle harness's pandas path degrades
            # DECIMAL columns to float (silent >2^53 rounding), so a
            # decimal output column is not hash-comparable.
            F.expr(
                "CAST(SUM(CAST(doc_id AS DECIMAL(38,0))) % 1000000007"
                " AS BIGINT)"
            ).alias("id_checksum"),
            F.min_by("doc_id", "shuffle_key").alias("first_id"),
            F.max_by("doc_id", "shuffle_key").alias("last_id"),
        )
        .orderBy("shard")
    )


@register(
    "s_semdedup",
    # Planted-duplicate audit (same pattern as s_embedding_near_dup):
    # an exact copy shares its original's vector, hence its cluster
    # assignment and its centroid-cosine bit-for-bit, so the
    # dedup edge (cos = 1.0 >= 0.95) fires and the dominance
    # tie-break (equal c_sim -> higher id loses) removes exactly the
    # copy. With the corpus's max natural pairwise cosine measured
    # ~0.6 (isotropic vectors), NO non-planted edge can reach the
    # 0.95 threshold, so the removal set must equal the planted-copy
    # set exactly: completeness AND no-false-removals are both
    # guarantees, emitted as data.
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(COUNT(*) AS BIGINT) AS n_removed_total,
       TRUE AS planted_complete_ok,
       TRUE AS no_false_removals_ok
FROM embeddings WHERE vec_id % 10 = 0
""",
    doc="SemDeDup cluster-scoped semantic dedup (Abbas et al. 2023): "
    "assign to nearest centroid, within-cluster cosine edges, "
    "keep-the-far-from-centroid dominance — emitted as the planted "
    "exact-duplicate audit (every copy removed, nothing else)",
)
def s_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    planted = e.filter(F.col("vec_id") % 10 == 0)
    off = _plant_offset(e, "vec_id")
    aug = e.unionByName(_shift_ids(planted, off, "vec_id"))
    cents = S.centroids(aug)
    res = S.semdedup(
        aug.select("vec_id", "embedding"), cents, threshold=0.95
    )
    truth = _shift_ids(planted.select("vec_id"), off, "vec_id")
    removed_ids = res.filter(F.col("removed")).select("vec_id")
    n_true = truth.agg(F.count("*").alias("n_planted"))
    n_removed = removed_ids.agg(F.count("*").alias("n_removed_total"))
    n_hit = truth.join(removed_ids, "vec_id", "left_semi").agg(
        F.count("*").alias("__n_hit")
    )
    return (
        n_true.crossJoin(n_removed)
        .crossJoin(n_hit)
        .select(
            "n_planted",
            "n_removed_total",
            (F.col("__n_hit") == F.col("n_planted")).alias(
                "planted_complete_ok"
            ),
            (F.col("n_removed_total") == F.col("n_planted")).alias(
                "no_false_removals_ok"
            ),
        )
    )


@register(
    "s_hier_assign",
    # Equivalence audit (AUDIT-ORACLE pattern): the two-level coarse
    # quantizer GUARANTEES bit-exact equality with flat assignment
    # when every super-group is probed (probe_supers = super_k) —
    # the per-(vector, centroid) cosine and the (desc c_sim, asc
    # cluster) tie order are identical expressions, only the
    # candidate enumeration differs, and probing everything restores
    # the full candidate set. Emitted as data: full-probe mismatch
    # count must be 0 over the whole corpus, and both paths must
    # assign every vector exactly once (partition property). The
    # interesting approximation (p < s) is measured in SCALE.md, not
    # hashed — its agreement rate is corpus-dependent by design.
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(*) AS BIGINT) AS n_flat,
       CAST(COUNT(*) AS BIGINT) AS n_two_level,
       TRUE AS full_probe_exact_ok
FROM embeddings
""",
    doc="hierarchical (two-level) nearest-centroid assignment: "
    "driver-side super-grouping of the centroid table, probe-limited "
    "member dots — audited by bit-exact equivalence to flat "
    "assignment at full probe width",
)
def s_hier_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    cents = S.centroids(e)
    # each assignment frame feeds BOTH the mismatch join and its own
    # count below — checkpoint once so the n×k assignment pipeline
    # (the exact stage this operator exists to cut) runs once per path
    flat = S.assign_nearest_centroid(e, cents).select(
        "vec_id", F.col("cluster").alias("cf"), F.col("c_sim").alias("sf")
    ).localCheckpoint(eager=True)
    two = S.assign_nearest_centroid(
        e, cents, super_k=4, probe_supers=4
    ).select(
        "vec_id", F.col("cluster").alias("ct"), F.col("c_sim").alias("st")
    ).localCheckpoint(eager=True)
    joined = flat.join(two, "vec_id", "full")
    mismatch = joined.filter(
        ~(
            F.col("cf").eqNullSafe(F.col("ct"))
            & F.col("sf").eqNullSafe(F.col("st"))
        )
    ).agg(F.count("*").alias("__bad"))
    return (
        flat.agg(F.count("*").alias("n_flat"))
        .crossJoin(two.agg(F.count("*").alias("n_two_level")))
        .crossJoin(e.agg(F.count("*").alias("n_vectors")))
        .crossJoin(mismatch)
        .select(
            "n_vectors",
            "n_flat",
            "n_two_level",
            (F.col("__bad") == 0).alias("full_probe_exact_ok"),
        )
    )
