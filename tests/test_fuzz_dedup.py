"""Fuzz-parity lens over the dedup collapse chain: connected
components vs a Python union-find (a third opinion — the existing
random-graph test compares the two Spark forms against each other,
which a shared bug survives), incremental exact dedup vs its batch
semantics replayed naively over random increment splits, and
canonical selection vs a naive argmax. Random inputs include nulls,
self-loops, duplicate/reversed edges, and empty batches."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# dup_groups / dup_groups_star vs union-find
# ---------------------------------------------------------------------------

# ids include None: a null id is NOT a node (pinned contract, shared
# by dup_groups and dup_groups_star) — the non-null side of a
# null-sided pair survives as a singleton
_maybe_id = st.one_of(st.none(), st.integers(min_value=0, max_value=15))
edge_lists = st.lists(
    st.tuples(_maybe_id, _maybe_id),
    min_size=0,
    max_size=30,
)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for n in (a, b):
            if n is not None:
                parent.setdefault(n, n)
        if a is None or b is None:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


@given(edges=edge_lists)
@FUZZ
def test_fuzz_components_match_union_find(spark, edges):
    from data_engineering_hs_spark.operators.dedup import (
        dup_groups,
        dup_groups_star,
    )

    # null ids flow through unfiltered — both forms must drop them as
    # nodes while keeping the non-null side as a singleton
    df = spark.createDataFrame(
        edges or [(None, None)], "id_a long, id_b long"
    )
    exp = _union_find_components(edges)
    got = {
        r["doc_id"]: r["component"]
        for r in dup_groups(df, max_iters=60).collect()
    }
    assert got == exp, edges
    star = {
        r["doc_id"]: r["component"]
        for r in dup_groups_star(df).collect()
    }
    assert star == exp, edges


# ---------------------------------------------------------------------------
# incremental_exact_dedup replayed over random increment splits vs a
# naive replay of its contract: first batch holding a fingerprint
# wins with its lowest id. NULL text does NOT escape dedup:
# fingerprint64 = xxhash64(normalized_text), and xxhash64 skips null
# inputs, returning the seed constant — all null-text rows share one
# non-null fingerprint and dedup as a single group across batches.
# ---------------------------------------------------------------------------

batches_strategy = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.one_of(
                st.none(),
                st.sampled_from(
                    ["", "Red Fox", "red  fox", "BLUE dog", "blue dog", "fox"]
                ),
            ),
        ),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=3,
)


def _norm_key(text):
    # the "\0null" sentinel mirrors fingerprint64's behavior: null
    # text yields the constant seed hash, one dedup group like any key
    return "\0null" if text is None else " ".join(text.lower().split())


@given(batches=batches_strategy)
@FUZZ
def test_fuzz_incremental_dedup_matches_naive_replay(spark, batches):
    from pyspark.sql import functions as F

    from data_engineering_hs_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    # unique ids across the whole stream (including within a batch)
    seen_ids: set[int] = set()
    uniq_batches = []
    for b in batches:
        rows = []
        for i, t in b:
            if i not in seen_ids:
                seen_ids.add(i)
                rows.append((i, t))
        uniq_batches.append(rows)

    store = None
    got: list[set[int]] = []
    for rows in uniq_batches:
        bdf = spark.createDataFrame(
            rows or [(None, None)], "doc_id long, text string"
        ).filter("doc_id is not null")
        surv = incremental_exact_dedup(bdf, store, "text", "doc_id")
        surv = surv.select("doc_id", "fingerprint").cache()
        got.append({r["doc_id"] for r in surv.collect()})
        fps = surv.select("fingerprint").filter(
            F.col("fingerprint").isNotNull()
        )
        store = fps if store is None else store.unionByName(fps)

    stored_keys: set[str] = set()
    for rows, got_ids in zip(uniq_batches, got):
        exp_ids = set()
        batch_first: dict[str | None, int] = {}
        for i, t in sorted(rows, key=lambda r: r[0]):
            k = _norm_key(t)
            if k not in batch_first:
                batch_first[k] = i
        for k, i in batch_first.items():
            if k not in stored_keys:
                exp_ids.add(i)
                stored_keys.add(k)
        assert got_ids == exp_ids, (batches, rows, got_ids, exp_ids)


# ---------------------------------------------------------------------------
# canonicalize_duplicates vs naive argmax (null quality loses, ties
# break by min id, null group self-maps)
# ---------------------------------------------------------------------------

canon_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)


@given(rows=canon_rows)
@FUZZ
def test_fuzz_canonicalize_matches_naive_argmax(spark, rows):
    from data_engineering_hs_spark.operators.dedup import (
        canonicalize_duplicates,
    )

    df = spark.createDataFrame(
        rows or [(None, None, None)], "doc_id long, grp int, quality int"
    ).filter("doc_id is not null")
    got = {
        r["doc_id"]: (r["grp"], r["canonical_id"])
        for r in canonicalize_duplicates(df, "grp", "quality", "doc_id").collect()
    }
    exp = {}
    by_group: dict[int, list] = {}
    for i, g, q in rows:
        if g is None:
            exp[i] = (None, i)
        else:
            by_group.setdefault(g, []).append((i, q))
    for g, members in by_group.items():
        canon = min(
            members,
            key=lambda m: (-(m[1] if m[1] is not None else float("-inf")), m[0]),
        )[0]
        for i, _ in members:
            exp[i] = (g, canon)
    assert got == exp, rows
