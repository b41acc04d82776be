"""Fuzz-parity lens, batch 6: the dbt-style quality checks vs naive
Python over random frames with nulls and duplicates — not_null /
unique / accepted_values counts, and split_by_rules' three-valued
logic (NULL verdict quarantines, reasons collect EVERY failed rule).
Reference semantics: magic_shop/models/schema.yml tests."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=0,
    max_size=25,
)


@given(rows=rows_strategy)
@FUZZ
def test_fuzz_violation_counts_match_naive(spark, rows):
    from collections import Counter

    from data_engineering_hs_spark.quality.assertions import (
        accepted_values_violations,
        not_null_violations,
        unique_violations,
    )

    df = spark.createDataFrame(rows or [(None, None)], "k string, v int")
    if not rows:
        df = df.filter("k is not null or v is not null")

    def count_of(report):
        return report.collect()[0]["violations"]

    assert count_of(not_null_violations(df, "k")) == sum(
        1 for k, _ in rows if k is None
    )
    counts = Counter(k for k, _ in rows if k is not None)
    assert count_of(unique_violations(df, "k")) == sum(
        n - 1 for n in counts.values() if n > 1
    )
    # accepted_values ignores NULLs (nullness is not_null's job)
    assert count_of(accepted_values_violations(df, "k", ["a", "b"])) == sum(
        1 for k, _ in rows if k is not None and k not in ("a", "b")
    )


@given(rows=rows_strategy)
@FUZZ
def test_fuzz_split_by_rules_matches_naive(spark, rows):
    from data_engineering_hs_spark.quality.assertions import split_by_rules

    df = spark.createDataFrame(rows or [(None, None)], "k string, v int")
    if not rows:
        df = df.filter("k is not null or v is not null")
    rules = [("k_known", "k IN ('a', 'b')"), ("v_nonneg", "v >= 0")]
    valid, quar = split_by_rules(df, rules)
    got_valid = sorted(((r["k"], r["v"]) for r in valid.collect()), key=repr)
    got_quar = sorted(
        ((r["k"], r["v"], tuple(r["dq_reasons"])) for r in quar.collect()),
        key=repr,
    )
    exp_valid, exp_quar = [], []
    for k, v in rows:
        reasons = []
        if not (k in ("a", "b")):  # NULL verdict fails (unknown ≠ valid)
            reasons.append("k_known")
        if not (v is not None and v >= 0):
            reasons.append("v_nonneg")
        if reasons:
            exp_quar.append((k, v, tuple(reasons)))
        else:
            exp_valid.append((k, v))
    assert got_valid == sorted(exp_valid, key=repr), rows
    assert got_quar == sorted(exp_quar, key=repr), rows
