"""Iterative graph analytics on DataFrames: PageRank.

Companion to operators.dedup.dup_groups (min-label connected
components): both are driver-side loops over pure DataFrame steps, the
Pregel-on-Spark shape. Each PageRank iteration is

    contribs = ranks ⋈ out_degree ⋈ edges  →  groupBy(dst).sum
    rank'    = (1-d)/N + d · contribs

i.e. one equi-join + one aggregation per iteration, both shuffling on
the node key — the standard distributed formulation (GraphX's
staticPageRank does exactly this per superstep). Ranks are ROUNDED to
a fixed number of decimals after every iteration: that makes the
fixed-iteration result bit-reproducible across engines (the DuckDB
oracle unrolls the same iterations with the same rounding), across
partitionings, and across AQE re-plans — the same determinism
discipline as money-cents aggregation.

At scale: ranks/degrees are node-sized (≪ edges) and broadcast when
small; the edges table is the only big operand and is never
re-shuffled if pre-partitioned by src. The loop materializes ranks
per iteration via localCheckpoint to cut the growing lineage —
without it, iteration k replans k joins deep (same lesson as
dup_groups, dedup.py:38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    round_decimals: int = 10,
) -> DataFrame:
    """Fixed-iteration weighted PageRank over an edge list.

    Nodes = union of sources and destinations; dangling nodes (no
    out-edges) contribute nothing (their mass leaks, the simple
    variant). Returns (node, rank) after `iterations` rounds from a
    uniform start, each round rounded to `round_decimals`.
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w.cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    n_nodes = nodes.agg(F.count("*").alias("n"))
    base = (1.0 - damping)

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.round(F.lit(1.0) / F.col("n"), round_decimals).alias("rank"),
    )
    for _ in range(iterations):
        contribs = (
            ranks.withColumnRenamed("node", "src")
            .join(out_w, "src")
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("out_w")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                F.round(
                    base / F.col("n") + damping * F.coalesce("c", F.lit(0.0)),
                    round_decimals,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
