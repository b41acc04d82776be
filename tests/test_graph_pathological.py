"""Pathological-graph shapes through the connected-components pair
(r14 lens, from the r15 candidate queue). The fuzz lens covers
random graphs; these are the ADVERSARIAL densities and shapes a
boilerplate-heavy dedup actually produces: a complete clique (every
doc near-dups every other — the capped-hot-bucket output shape), a
giant star (one template hub touching thousands of leaves), two
cliques joined by one bridge edge (the merge case that splits if
label propagation stops early), and a barbell with the bridge listed
FIRST (ordering must not matter).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )


def _components(rows):
    out = {}
    for r in rows:
        out.setdefault(r["component"], set()).add(r["doc_id"])
    return {frozenset(v) for v in out.values()}


class TestPathologicalGraphs:
    def test_complete_clique_collapses_in_one_component(self, spark):
        from data_engineering_hs_spark.operators.dedup import (
            dup_groups,
            dup_groups_star,
        )

        n = 40  # C(40,2) = 780 edges, diameter 1
        edges = list(combinations(range(n), 2))
        for fn in (dup_groups, dup_groups_star):
            rows = fn(_pairs(spark, edges)).collect()
            assert _components(rows) == {frozenset(range(n))}, fn.__name__
            assert all(r["component"] == 0 for r in rows)

    def test_giant_star_hub(self, spark):
        from data_engineering_hs_spark.operators.dedup import (
            dup_groups,
            dup_groups_star,
        )

        n_leaves = 5000
        edges = [(0, i) for i in range(1, n_leaves + 1)]
        for fn in (dup_groups, dup_groups_star):
            rows = fn(_pairs(spark, edges)).collect()
            assert len(rows) == n_leaves + 1, fn.__name__
            assert all(r["component"] == 0 for r in rows), fn.__name__

    def test_bridged_cliques_merge_regardless_of_edge_order(self, spark):
        from data_engineering_hs_spark.operators.dedup import (
            dup_groups,
            dup_groups_star,
        )

        left = list(combinations(range(0, 20), 2))
        right = list(combinations(range(100, 120), 2))
        bridge = [(19, 100)]
        for fn in (dup_groups, dup_groups_star):
            for edges in (left + right + bridge, bridge + left + right):
                rows = fn(_pairs(spark, edges)).collect()
                comp = _components(rows)
                assert comp == {
                    frozenset(range(0, 20)) | frozenset(range(100, 120))
                }, (fn.__name__, "bridge split the component")

    def test_disjoint_cliques_stay_disjoint(self, spark):
        from data_engineering_hs_spark.operators.dedup import (
            dup_groups_star,
        )

        a = list(combinations(range(0, 15), 2))
        b = list(combinations(range(50, 65), 2))
        rows = dup_groups_star(_pairs(spark, a + b)).collect()
        assert _components(rows) == {
            frozenset(range(0, 15)),
            frozenset(range(50, 65)),
        }
