"""Fuzz-parity lens, batch 7: chunk_documents' sliding windows vs a
naive Python chunker (trailing-start suppression, overlap bounds,
short docs), and feature_hash_counts vs naive sparse vectors rebuilt
from the operator's own token-hash expression (isolating the
accumulate/sort logic) plus the L1 conservation law."""

from __future__ import annotations

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
    max_size=14,
)
doc_texts = st.lists(
    st.one_of(st.none(), st.just(""), words.map(" ".join)),
    min_size=0,
    max_size=10,
)


def _toks(text):
    return text.strip().split() if text and text.strip() else []


@given(
    texts=doc_texts,
    params=st.sampled_from([(3, 0), (3, 1), (5, 2), (5, 4)]),
)
@FUZZ
def test_fuzz_chunk_documents_matches_naive(spark, texts, params):
    from data_engineering_hs_spark.operators.corpus import chunk_documents

    chunk_tokens, overlap = params
    rows = list(enumerate(texts))
    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id int, text string"
    ).filter("doc_id is not null")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, "text", "doc_id", chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    )
    stride = chunk_tokens - overlap
    exp = []
    for i, text in rows:
        toks = _toks(text)
        n = len(toks)
        if n == 0:
            continue
        starts = [
            s
            for s in range(1, n + 1, stride)
            if s == 1 or s <= n - overlap
        ]
        for cid, s in enumerate(starts):
            chunk = toks[s - 1 : s - 1 + chunk_tokens]
            exp.append((i, cid, " ".join(chunk), len(chunk)))
    assert got == sorted(exp), (texts, params)


@given(texts=doc_texts, dim=st.sampled_from([4, 1024]))
@FUZZ
def test_fuzz_feature_hash_matches_naive(spark, texts, dim):
    from collections import Counter

    from pyspark.sql import functions as F

    from data_engineering_hs_spark.functions.text import tokens
    from data_engineering_hs_spark.operators.corpus import (
        feature_hash_counts,
    )

    rows = list(enumerate(texts))
    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id int, text string"
    ).filter("doc_id is not null")
    # the operator's own hash expression, collected per token — the
    # parity isolates the accumulate/sort/collect logic
    tok_idx = (
        df.select(F.col("doc_id"), F.explode(tokens("text")).alias("t"))
        .select("doc_id", F.pmod(F.xxhash64("t"), F.lit(dim)).alias("idx"))
        .collect()
    )
    per_doc: dict[int, Counter] = {}
    for r in tok_idx:
        per_doc.setdefault(r["doc_id"], Counter())[r["idx"]] += 1
    got = {
        r["doc_id"]: (list(r["indices"]), list(r["counts"]))
        for r in feature_hash_counts(df, "text", "doc_id", dim=dim).collect()
    }
    assert set(got) == set(per_doc), texts  # tokenless docs absent both
    for i, c in per_doc.items():
        idxs = sorted(c)
        assert got[i] == (idxs, [c[x] for x in idxs]), (texts, dim, i)
        # L1 conservation: sum(counts) == token count, any collisions
        assert sum(got[i][1]) == sum(c.values())
        assert all(0 <= x < dim for x in got[i][0])
