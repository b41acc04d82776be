"""Fuzz-parity lens over the corpus/dedup operator families that the
round-12 relational fuzz did not reach: segment_dedup, SimHash
pigeonhole blocking, winnowing windows, hash_split / stratified
sampling invariants, and pack_sequences bin parity. Each operator is
checked against a NAIVE Python re-implementation on random inputs
(nulls, empties, duplicate content, boundary sizes) — the pattern
that found the asof merge-key crash and the range-join/setsim pins.

Reference semantics: Nye1nChanSoe/data-engineering-hs lab03 dedup
notebooks (segment/C4-style) and the SURVEY §2 LLM-pipeline rows."""

from __future__ import annotations

import math
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny vocab (plus "" to force multi-space runs) so random docs share
# segments/shingles and duplicate content actually occurs.
words = st.lists(
    st.sampled_from(["red", "blue", "fox", "dog", ""]),
    min_size=0,
    max_size=14,
)
doc_texts = st.lists(
    st.one_of(st.none(), st.just(""), st.just("   "), words.map(" ".join)),
    min_size=0,
    max_size=10,
)


def _toks(text):
    return text.strip().split() if text and text.strip() else []


# ---------------------------------------------------------------------------
# segment_dedup vs a naive global-first-occurrence collapse
# ---------------------------------------------------------------------------


def _naive_segment_dedup(rows, seg_tokens):
    segs = []  # (doc_id, seg_idx, seg)
    for did, text in rows:
        toks = _toks(text)
        n = math.ceil(len(toks) / seg_tokens)
        for i in range(1, max(n, 1) + 1):
            seg = " ".join(toks[(i - 1) * seg_tokens : i * seg_tokens])
            if seg != "":
                segs.append((did, i, seg))
    winners = {}
    for did, i, seg in segs:
        cur = winners.get(seg)
        if cur is None or (did, i) < cur:
            winners[seg] = (did, i)
    out = {}
    for did, i, seg in segs:
        e = out.setdefault(did, [0, []])
        e[0] += 1
        if winners[seg] == (did, i):
            e[1].append((i, seg))
    return {
        did: (n, len(kept), " ".join(s for _, s in sorted(kept)))
        for did, (n, kept) in out.items()
    }


@given(texts=doc_texts, seg_tokens=st.sampled_from([2, 3]))
@FUZZ
def test_fuzz_segment_dedup_matches_naive(spark, texts, seg_tokens):
    from data_engineering_hs_spark.operators.corpus import segment_dedup

    rows = list(enumerate(texts))
    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id int, text string"
    ).filter("doc_id is not null")
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["dedup_text"])
        for r in segment_dedup(df, "doc_id", "text", seg_tokens=seg_tokens).collect()
    }
    assert got == _naive_segment_dedup(rows, seg_tokens), (texts, seg_tokens)


# ---------------------------------------------------------------------------
# simhash_near_pairs: pigeonhole blocking must be COMPLETE vs the
# all-pairs popcount (recall guarantee up to max_hamming), and exact
# (every emitted pair's distance verified).
# ---------------------------------------------------------------------------


@given(texts=doc_texts, h=st.sampled_from([3, 8, 15]))
@FUZZ
def test_fuzz_simhash_blocking_complete_vs_all_pairs(spark, texts, h):
    from data_engineering_hs_spark.operators.dedup import (
        simhash64,
        simhash_near_pairs,
    )

    rows = list(enumerate(texts))
    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id int, text string"
    ).filter("doc_id is not null")
    sims = {
        r["doc_id"]: r["simhash"]
        for r in simhash64(df, "text", "doc_id").collect()
        if r["simhash"] is not None
    }
    exp = set()
    for a, b in combinations(sorted(sims), 2):
        d = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
        if d <= h:
            exp.add((a, b, d))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(
            df, "text", "doc_id", max_hamming=h, max_bucket_size=10_000
        ).collect()
    }
    assert got == exp, (texts, h)


# ---------------------------------------------------------------------------
# winnowing_fingerprints vs a naive winnow over the SAME positional
# shingle hashes (computed once via the operator's own expression, so
# the parity isolates the WINDOWING logic, not the hash function).
# ---------------------------------------------------------------------------


@given(texts=doc_texts, window=st.sampled_from([2, 4]))
@FUZZ
def test_fuzz_winnowing_matches_naive(spark, texts, window):
    from pyspark.sql import functions as F

    from data_engineering_hs_spark.functions.text import word_shingle_seq
    from data_engineering_hs_spark.operators.corpus import (
        winnowing_fingerprints,
    )

    k = 2
    rows = list(enumerate(texts))
    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id int, text string"
    ).filter("doc_id is not null")
    hashes = (
        df.select(
            "doc_id",
            F.posexplode(word_shingle_seq("text", k=k)).alias("pos", "s"),
        )
        .select("doc_id", "pos", F.xxhash64("s").alias("h"))
        .collect()
    )
    per: dict[int, list[int]] = {}
    for r in sorted(hashes, key=lambda r: (r["doc_id"], r["pos"])):
        per.setdefault(r["doc_id"], []).append(r["h"])
    exp = {}
    for did, hs in per.items():
        if len(hs) <= window - 1:
            exp[did] = {min(hs)}
        else:
            exp[did] = {
                min(hs[i : i + window]) for i in range(len(hs) - window + 1)
            }
    got: dict[int, set[int]] = {}
    for r in winnowing_fingerprints(df, "text", "doc_id", k=k, window=window).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert got == exp, (texts, window)


# ---------------------------------------------------------------------------
# hash_split: exhaustive, disjoint-by-construction, deterministic, and
# SUBSET-STABLE (splitting any subset agrees with the full run — the
# no-example-migration property training pipelines rely on).
# ---------------------------------------------------------------------------

id_lists = st.lists(
    st.text(alphabet="abcdefgh0123456789-_", min_size=0, max_size=12),
    min_size=0,
    max_size=20,
    unique=True,
)
split_specs = st.sampled_from(
    [
        (("train", 0.9), ("val", 0.05), ("test", 0.05)),
        (("only", 1.0),),
        (("x", 2.0), ("y", 1.0)),  # weights normalized by total
        (("a", 0.5), ("b", 0.5)),
    ]
)


@given(ids=id_lists, splits=split_specs)
@FUZZ
def test_fuzz_hash_split_invariants(spark, ids, splits):
    from data_engineering_hs_spark.operators.corpus import hash_split

    df = spark.createDataFrame(
        [(i,) for i in ids] or [(None,)], "doc_id string"
    ).filter("doc_id is not null")
    full = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", splits=splits).collect()
    }
    names = {n for n, _ in splits}
    assert set(full) == set(ids)
    assert set(full.values()) <= names
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", splits=splits).collect()
    }
    assert again == full
    half = ids[::2]
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df.filter(df.doc_id.isin(half) if half else "false"),
            "doc_id",
            splits=splits,
        ).collect()
    }
    assert sub == {i: full[i] for i in half}


# ---------------------------------------------------------------------------
# stratified_quota_sample: exactly min(quota, |stratum|) per stratum
# (null stratum is a group), sample ⊆ input, deterministic.
# ---------------------------------------------------------------------------

strat_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.integers(min_value=0, max_value=10_000),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[1],
)


@given(rows=strat_rows, quota=st.sampled_from([1, 2, 4]))
@FUZZ
def test_fuzz_stratified_quota_invariants(spark, rows, quota):
    from collections import Counter

    from data_engineering_hs_spark.operators.corpus import (
        stratified_quota_sample,
    )

    df = spark.createDataFrame(
        rows or [(None, None)], "stratum string, doc_id long"
    ).filter("doc_id is not null")
    out = stratified_quota_sample(df, "stratum", "doc_id", quota=quota).collect()
    sizes = Counter(s for s, _ in rows)
    got = Counter(r["stratum"] for r in out)
    assert got == Counter(
        {s: min(quota, n) for s, n in sizes.items() if n}
    ), rows
    in_pairs = set(rows)
    assert {(r["stratum"], r["doc_id"]) for r in out} <= in_pairs
    rerun = {
        (r["stratum"], r["doc_id"])
        for r in stratified_quota_sample(
            df, "stratum", "doc_id", quota=quota
        ).collect()
    }
    assert rerun == {(r["stratum"], r["doc_id"]) for r in out}


# ---------------------------------------------------------------------------
# pack_sequences: exact bin parity with a naive shard-local greedy
# packer (the invariants test in test_properties pins capacity/
# coverage; this pins the ACTUAL bin assignments, including the
# oversize-sits-alone and boundary fill==target paths).
# ---------------------------------------------------------------------------

size_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=1, max_value=120),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(rows=size_rows, target=st.sampled_from([64, 100]))
@FUZZ
def test_fuzz_pack_sequences_matches_naive_greedy(spark, rows, target):
    from data_engineering_hs_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id long, n_tokens long"
    ).filter("doc_id is not null")
    out = pack_sequences(
        df, size_col="n_tokens", id_col="doc_id", target=target, shards=3
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    sizes = dict(rows)
    assert {r["id"] for r in out} == set(sizes)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["id"])
        b, fill = 0, 0
        for r in shard_rows:
            sz = sizes[r["id"]]
            if fill > 0 and fill + sz > target:
                b, fill = b + 1, 0
            assert (r["bin_id"], r["oversize"], r["size"]) == (
                b,
                sz > target,
                sz,
            ), (rows, target, r)
            fill += sz
            if sz > target:
                b, fill = b + 1, 0
