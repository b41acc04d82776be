"""Vector math over array<float|double> embedding columns.

Pure Column expressions via higher-order functions (F.zip_with /
F.aggregate) — JVM-evaluated, no Python per row. Sequential fold
order makes results deterministic for a given row, which the oracle
comparison relies on.

Used by similarity-search and embedding-near-dup operators over the
`embeddings` table (embedding: array<float>, 64-dim).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_engineering_hs_spark.functions.scalar import ColumnOrName, _col


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two equal-length numeric arrays (double fold)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: ColumnOrName) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(
            _col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    d = dot(a, b)
    nn = norm(a) * norm(b)
    return F.when(nn == 0, F.lit(0.0)).otherwise(d / nn)


def l2_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    diffs = F.zip_with(
        _col(a), _col(b), lambda x, y: (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v))


def mean_vector(a: ColumnOrName) -> Column:
    """Elementwise mean of an array column is an aggregate — see
    operators.similarity.centroids for the groupBy form."""
    raise NotImplementedError("use operators.similarity.centroids")
