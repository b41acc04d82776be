"""Fuzz-parity lens, batch 10: synchronous label propagation vs an
exact naive Python mirror — the operator's determinism contract
(synchronous update, majority vote, ties to smallest label, fixed
rounds) makes bit-exact random-graph parity possible. Self-loops and
duplicate/reversed edges included; isolated (self-loop-only) nodes
are outside the graph by contract."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=0,
    max_size=28,
)


@given(edges=edge_lists, iterations=st.sampled_from([1, 4]))
@FUZZ
def test_fuzz_label_propagation_matches_naive(spark, edges, iterations):
    from collections import Counter

    from data_engineering_hs_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        edges or [(None, None)], "src long, dst long"
    ).filter("src is not null")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iterations=iterations).collect()
    }
    neigh: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            neigh.setdefault(a, set()).add(b)
            neigh.setdefault(b, set()).add(a)
    labels = {n: n for n in neigh}
    for _ in range(iterations):
        labels = {
            a: min(
                Counter(labels[b] for b in bs).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for a, bs in neigh.items()
        }
    assert got == labels, (edges, iterations)
