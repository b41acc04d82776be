"""Fuzz-parity lens, batch 4: benchmark decontamination vs naive set
overlap, weighted (domain-mix) quotas vs naive per-stratum math, and
shuffle_shards vs a Python recomputation of the md5(seed:id) key —
the module's reproducibility guarantee checked bit-for-bit from
outside Spark."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.sampled_from(["red", "blue", "fox", "dog", "run"]),
    min_size=0,
    max_size=10,
)
doc_texts = st.lists(
    st.one_of(st.none(), st.just(""), words.map(" ".join)),
    min_size=0,
    max_size=10,
)


def _toks(text):
    return text.strip().split() if text and text.strip() else []


def _gram_set(text, n):
    toks = _toks(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


# ---------------------------------------------------------------------------
# decontaminate vs naive n-gram overlap
# ---------------------------------------------------------------------------


@given(corpus=doc_texts, bench=doc_texts)
@FUZZ
def test_fuzz_decontaminate_matches_naive(spark, corpus, bench):
    from data_engineering_hs_spark.operators.corpus import decontaminate

    n = 2
    crows = list(enumerate(corpus))
    cdf = spark.createDataFrame(
        crows or [(None, None)], "doc_id int, text string"
    ).filter("doc_id is not null")
    bdf = spark.createDataFrame(
        [(t,) for t in bench] or [(None,)], "text string"
    )
    got = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate(cdf, bdf, "text", "doc_id", n=n).collect()
    }
    bench_grams = set().union(*(_gram_set(t, n) for t in bench), set())
    exp = {}
    for i, t in crows:
        shared = len(_gram_set(t, n) & bench_grams)
        if shared:
            exp[i] = shared
    assert got == exp, (corpus, bench)


# ---------------------------------------------------------------------------
# weighted_quota_sample vs naive per-stratum quota math
# ---------------------------------------------------------------------------

strat_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["web", "code", "math"])),
        st.integers(min_value=0, max_value=10_000),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[1],
)
quota_maps = st.sampled_from(
    [
        {"web": 3, "code": 1},
        {"web": 0, "math": 2},
        {"code": 100},
        {},
    ]
)


@given(rows=strat_rows, quotas=quota_maps)
@FUZZ
def test_fuzz_weighted_quota_matches_naive(spark, rows, quotas):
    from collections import Counter

    from data_engineering_hs_spark.operators.corpus import (
        weighted_quota_sample,
    )

    df = spark.createDataFrame(
        rows or [(None, None)], "stratum string, doc_id long"
    ).filter("doc_id is not null")
    out = weighted_quota_sample(df, "stratum", "doc_id", quotas).collect()
    sizes = Counter(s for s, _ in rows)
    got = Counter(r["stratum"] for r in out)
    # strata absent from quotas (and null strata) are dropped; present
    # strata fill to min(quota, size)
    exp = Counter(
        {
            s: min(q, sizes[s])
            for s, q in quotas.items()
            if min(q, sizes[s]) > 0
        }
    )
    assert got == exp, (rows, quotas)
    assert {(r["stratum"], r["doc_id"]) for r in out} <= set(rows)
    rerun = {
        (r["stratum"], r["doc_id"])
        for r in weighted_quota_sample(df, "stratum", "doc_id", quotas).collect()
    }
    assert rerun == {(r["stratum"], r["doc_id"]) for r in out}


# ---------------------------------------------------------------------------
# shuffle_shards vs a Python recomputation of md5(seed:id): shard
# assignment and within-shard order are bit-stable and engine-free
# ---------------------------------------------------------------------------

id_lists = st.lists(
    st.integers(min_value=0, max_value=10_000),
    min_size=0,
    max_size=25,
    unique=True,
)


@given(ids=id_lists, n_shards=st.sampled_from([1, 4, 8]), seed=st.sampled_from(["v1", "v2"]))
@FUZZ
def test_fuzz_shuffle_shards_match_python_md5(spark, ids, n_shards, seed):
    from data_engineering_hs_spark.operators.corpus import shuffle_shards

    df = spark.createDataFrame(
        [(i,) for i in ids] or [(None,)], "doc_id long"
    ).filter("doc_id is not null")
    # scramble input partitioning: the assignment must not care
    out = shuffle_shards(
        df.repartition(5), "doc_id", n_shards=n_shards, seed=seed
    ).collect()
    exp_key = {
        i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids
    }
    exp_shard = {i: int(exp_key[i][:8], 16) % n_shards for i in ids}
    assert {r["doc_id"] for r in out} == set(ids)
    for r in out:
        assert r["shuffle_key"] == exp_key[r["doc_id"]], (r, seed)
        assert r["shard"] == exp_shard[r["doc_id"]], (r, n_shards)
    # within-shard order: rows of a shard, in collect order, are
    # sorted by key (sortWithinPartitions keeps shards contiguous)
    per_shard: dict[int, list[str]] = {}
    for r in out:
        per_shard.setdefault(r["shard"], []).append(r["shuffle_key"])
    for keys in per_shard.values():
        assert keys == sorted(keys), (ids, n_shards)
