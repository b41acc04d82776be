"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k of every query vector against
  the corpus — broadcast the (small) query set against the corpus so
  the big side never shuffles; rank via per-query window. The
  correctness baseline.
- ivf_topk: IVF-style approximate search — assign corpus vectors to
  the nearest of k centroids (one broadcast pass), probe only the
  nprobe nearest centroids per query. The scale path: the candidate
  set shrinks by ~k/nprobe and the join key (centroid id) is an
  equi-join, so Catalyst plans a plain shuffle/broadcast join.
- lsh_bucket_topk: random-hyperplane LSH buckets (sign of dot with
  fixed seeded vectors) as the non-learned alternative.
- centroids: per-label mean vectors via posexplode + positional agg.

Embedding dims are small arrays; all math is JVM-side zip_with/
aggregate folds in double (deterministic sequential order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_hs_spark.functions.vector import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, cos_sim).

    queries must be small enough to broadcast (the usual ANN-query
    shape); the corpus side streams partition-local — no shuffle
    until the final per-query top-k, which TakeOrdered-style window
    ranks on (query_id) partitions.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("q_vec", "c_vec").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector: posexplode → groupBy(label, pos) → avg →
    re-assemble ordered array. Two shuffles, both on small keys."""
    pos = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    by_pos = pos.groupBy(label_col, "pos").agg(
        F.sum(F.col("val").cast("double")).alias("s"), F.count("*").alias("n")
    )
    return (
        by_pos.withColumn("mean_val", F.col("s") / F.col("n"))
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("mean_val")))
                ),
                lambda s: s["mean_val"],
            ).alias("centroid")
        )
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an embedding column → (label, centroid).

    Deterministic seeding: the k vectors with the smallest ids.
    Each iteration = one broadcast assignment pass + one positional
    mean aggregation (posexplode → groupBy(center, pos)); the driver
    loop holds only the iteration counter. The IVF coarse quantizer
    trainer — replaces the label-derived centroids when labels are
    absent or uninformative.
    """
    init = df.orderBy(id_col).limit(k)
    centers = (
        init.select(F.col(vec_col).alias("centroid"))
        .withColumn("label", (F.monotonically_increasing_id()).cast("int"))
        .select("label", "centroid")
        .localCheckpoint(eager=True)
    )
    data = df.select(F.col(id_col), F.col(vec_col))
    for _ in range(iters):
        scored = data.join(F.broadcast(centers)).select(
            id_col,
            vec_col,
            "label",
            cosine(vec_col, "centroid").alias("sim"),
        )
        w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("label"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, vec_col, "label")
        )
        centers = (
            centroids(assigned, label_col="label", vec_col=vec_col)
            .localCheckpoint(eager=True)
        )
    return centers


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centers: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center_id_col: str = "label",
    center_vec_col: str = "centroid",
) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their nearest
    center; each query probes its `nprobe` nearest centers and ranks
    only those partitions' vectors.

    centers is tiny → broadcast everywhere; the only shuffle is the
    equi-join on center id. Recall depends on nprobe/k ratio exactly
    as in FAISS-style IVF-Flat.
    """
    cent = centers.select(
        F.col(center_id_col).alias("center_id"), F.col(center_vec_col).alias("center_vec")
    )

    def assign(df: DataFrame, idc: str, vecc: str, n: int, out: str) -> DataFrame:
        scored = df.join(F.broadcast(cent)).select(
            F.col(idc),
            F.col(vecc),
            F.col("center_id"),
            cosine(vecc, "center_vec").alias("center_sim"),
        )
        w = Window.partitionBy(idc).orderBy(F.desc("center_sim"), F.asc("center_id"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .select(F.col(idc), F.col(vecc), F.col("center_id").alias(out))
        )

    corpus_assigned = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "neighbor_id",
        "c_vec",
        1,
        "cell",
    )
    query_probes = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "query_id",
        "q_vec",
        nprobe,
        "cell",
    )
    cand = corpus_assigned.join(F.broadcast(query_probes), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("cos_sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def lsh_bucket_assign(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: sign bits of dots
    with n_planes pseudo-random unit directions. Plane weights are
    derived Python-side from sha256(seed, plane, index) and embedded
    as literal arrays — identical across jobs/clusters and free at
    runtime (no per-row plane construction)."""
    import hashlib

    def weight(p: int, i: int) -> float:
        h = hashlib.sha256(f"{seed}:{p}:{i}".encode()).digest()
        return int.from_bytes(h[:8], "big") / float(1 << 63) - 1.0

    bit_terms = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(weight(p, i)) for i in range(dim)]),
                    lambda x, w_: x.cast("double") * w_,
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            > 0,
            F.lit(1 << p).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for p in range(n_planes)
    ]
    bucket = sum(bit_terms[1:], bit_terms[0])
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hyperplane-LSH approximate top-k with multi-probe.

    Corpus vectors bucket once; each query probes its own bucket plus
    every bucket within Hamming distance `multiprobe_bits` of it
    (flip-one-bit neighbors), then exact-ranks the candidates. The
    non-learned ANN alternative to IVF — no training pass, stable
    under distribution shift, candidates ≈ corpus/2^planes × probes.
    """
    cb = lsh_bucket_assign(
        corpus, n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "bucket",
    )
    qb = lsh_bucket_assign(
        queries, n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket")
    # Probe masks: own bucket + all buckets within `multiprobe_bits`
    # Hamming distance (precomputed bit masks, applied via XOR).
    import itertools

    masks = [0]
    for nbits in range(1, multiprobe_bits + 1):
        for combo in itertools.combinations(range(n_planes), nbits):
            masks.append(sum(1 << p for p in combo))
    probes = [F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
    q_probes = qb.select(
        "query_id", "q_vec", F.explode(F.array(*probes)).alias("bucket")
    )
    cand = cb.join(F.broadcast(q_probes), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH-bucket candidates, exact
    cosine verify ≥ threshold. Bucket equality is a pre-filter only —
    exactness of the reported pairs comes from the verify."""
    b = lsh_bucket_assign(df, n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col)
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(f"a.{vec_col}", f"b.{vec_col}").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
