"""Deduplication operators for large-scale document pipelines.

Exact + near-dup family, all expressed as DataFrame plans (no Python
in the hot path except none at all — hashing uses xxhash64, a JVM
built-in):

- exact_duplicates:    fingerprint (xxhash64 of normalized text) →
                       groupBy. One shuffle on an 8-byte key.
- minhash_signatures / minhash_lsh_pairs:
                       shingle → k seeded xxhash64 minima → band →
                       bucket-join. The standard MinHash-LSH
                       construction (Broder 1997; Leskovec et al.,
                       Mining of Massive Datasets ch.3), expressed
                       with higher-order array functions + explode of
                       bands only (never of shingles × seeds).
- simhash64:           64-bit SimHash (Charikar 2002) over token
                       hashes via bit-counting in arrays.
- ngram_jaccard_pairs: exact Jaccard verification over candidate
                       pairs (used standalone at small scale, or as
                       the verify stage after LSH).
- embedding_near_dups: cosine > threshold pairs over an embedding
                       column (see operators.similarity).

Scale notes: LSH bucket join shuffles on (band, bucket-hash) — skew
appears when a bucket is hot (boilerplate docs); the band hash is
64-bit so genuine hash collisions are rare and AQE skew-join splits
hot buckets. Pair output is bounded by bucket sizes, not n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_hs_spark.functions.text import fingerprint64, tokens, word_shingles


def normalized_text(c) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(c) if isinstance(c, str) else c)), r"\s+", " ")


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of ids sharing identical normalized text.

    Returns (fingerprint, n_docs, doc_ids) for groups with n>1.
    At 100 TB: groupBy on the 8-byte xxhash64 fingerprint, never on
    the full text; collect_list only over intra-group ids.
    """
    return (
        df.select(F.col(id_col), fingerprint64(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, shingle_k: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: array of num_hashes minima.

    signature[i] = min over shingles of xxhash64(shingle, seed=i).
    Computed with transform+array_min over the shingle array — no
    explode, so the row count never blows up mid-plan.
    """
    sh = word_shingles(text_col, k=shingle_k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(s, seed))
        ),
    )
    return df.select(
        F.col(id_col),
        F.when(F.size(sh) > 0, sig).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    rows_per_band = num_hashes // bands. Docs agreeing on all rows of
    any band land in the same bucket; bucket self-join emits pairs
    (id_a < id_b), deduplicated across bands. With b=8, r=4 the
    S-curve threshold is (1/b)^(1/r) ≈ 0.59 Jaccard.
    """
    r = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k).filter(
        F.col("signature").isNotNull()
    )
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice("signature", b * r + 1, r)), b
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Exact word-set Jaccard over pairs.

    With `candidate_pairs` (id_a, id_b) supplied — e.g. from LSH —
    verification joins token sets to just those pairs. Without it,
    falls back to the all-pairs self-join (only sane at small n;
    callers at scale must pass candidates).
    """
    toks = df.select(
        F.col(id_col), F.array_distinct(tokens(text_col)).alias("tok_set")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    if candidate_pairs is not None:
        pairs = (
            candidate_pairs.join(
                a, candidate_pairs.id_a == F.col(f"a.{id_col}")
            ).join(b, candidate_pairs.id_b == F.col(f"b.{id_col}"))
        )
    else:
        pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    inter = F.size(F.array_intersect("a.tok_set", "b.tok_set"))
    union = F.size(F.array_union("a.tok_set", "b.tok_set"))
    jac = inter.cast("double") / union.cast("double")
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash: sign of per-bit sums of token hashes.

    For each bit position, count tokens whose xxhash64 has that bit
    set vs unset; bit is 1 if set-count > half. Pure array expressions.
    """
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)
    # Fixed 64-bit unroll (Python-side loop emits pure Column exprs).
    def bit_vote(i: int):
        # single-arg lambda: F.filter would treat a 2nd param as the
        # element index column.
        return F.size(
            F.filter(hashes, lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1)
        )

    bit_terms = [
        # bit 63 is the sign bit of a signed long.
        F.when(
            bit_vote(i) * 2 > n,
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    sim = sum(bit_terms[1:], bit_terms[0])
    return df.select(F.col(id_col), F.when(n > 0, sim).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: split the 64-bit hash into 4 16-bit chunks; any pair
    within distance 3 shares at least one exact chunk (pigeonhole),
    and generally chunk-equality is the candidate filter — the
    standard Manku et al. (WWW'07) rotation/blocking scheme, here with
    chunk buckets + exact popcount verify.
    """
    sims = simhash64(df, text_col, id_col).filter(F.col("simhash").isNotNull())
    chunks = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).cast("int")
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
