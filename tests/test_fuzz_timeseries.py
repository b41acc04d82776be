"""Fuzz-parity lens, batch 5: resample's dense grid vs a naive Python
bucketizer, detect_gaps vs naive consecutive diffs, and the
incremental partial-agg store (commit → append → materialize) vs a
one-shot aggregation over the union — random keys, negative and
fractional epochs, nulls, and duplicate timestamps."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

series_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.one_of(
            st.none(),
            st.integers(min_value=-40, max_value=40).map(lambda q: q / 4.0),
        ),  # ts (quarter-second grid, negatives included)
        st.one_of(st.none(), st.integers(min_value=-10, max_value=10)),
    ),
    min_size=0,
    max_size=25,
)


@given(rows=series_rows, bs=st.sampled_from([1, 7]))
@FUZZ
def test_fuzz_resample_matches_naive(spark, rows, bs):
    from pyspark.sql import functions as F

    from data_engineering_hs_spark.operators.timeseries import resample

    df = spark.createDataFrame(
        rows or [(None, None, None)], "k int, ts double, v int"
    ).filter("k is not null")
    got = {
        (r["k"], r["bucket_start"]): (r["s"], r["n"])
        for r in resample(
            df, "ts", ["k"], bs, {"s": F.sum("v"), "n": F.count("v")}
        ).collect()
    }
    buckets: dict[tuple[int, int], list] = {}
    for k, ts, v in rows:
        if ts is None:
            continue
        b = math.floor(ts / bs) * bs
        buckets.setdefault((k, b), []).append(v)
    exp = {}
    per_key: dict[int, list[int]] = {}
    for (k, b) in buckets:
        per_key.setdefault(k, []).append(b)
    for k, bs_list in per_key.items():
        for b in range(min(bs_list), max(bs_list) + 1, bs):
            if (k, b) not in buckets:
                # spine-filled empty bucket: EVERY agg is null, count
                # included (the documented left-join contract) — vs a
                # bucket holding only null values, whose count is 0
                exp[(k, b)] = (None, None)
                continue
            vals = [v for v in buckets[(k, b)] if v is not None]
            exp[(k, b)] = (sum(vals) if vals else None, len(vals))
    assert got == exp, (rows, bs)


@given(rows=series_rows, min_gap=st.sampled_from([1, 5]))
@FUZZ
def test_fuzz_detect_gaps_matches_naive(spark, rows, min_gap):
    from data_engineering_hs_spark.operators.timeseries import detect_gaps

    df = spark.createDataFrame(
        rows or [(None, None, None)], "k int, ts double, v int"
    ).filter("k is not null")
    got = sorted(
        (r["k"], r["gap_start"], r["gap_end"], r["gap_seconds"])
        for r in detect_gaps(df, "k", "ts", min_gap).collect()
    )
    per_key: dict[int, list[float]] = {}
    for k, ts, _ in rows:
        if ts is not None:
            per_key.setdefault(k, []).append(ts)
    exp = []
    for k, tss in per_key.items():
        tss.sort()
        for prev, cur in zip(tss, tss[1:]):
            if cur - prev >= min_gap:
                exp.append((k, prev, cur, cur - prev))
    assert got == sorted(exp), (rows, min_gap)


# ---------------------------------------------------------------------------
# incremental partial-agg store over random splits == one-shot agg
# ---------------------------------------------------------------------------

inc_batches = st.lists(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=0,
        max_size=10,
    ),
    min_size=1,
    max_size=3,
)


@given(batches=inc_batches)
@FUZZ
def test_fuzz_incremental_store_matches_one_shot(spark, batches):
    from data_engineering_hs_spark.operators.incremental import (
        commit_increment,
        materialize,
        partial_aggs,
    )

    measures = {
        "n": ("count", "v"),
        "s": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    table = "fuzz_inc_store"
    first = True
    for b in batches:
        bdf = spark.createDataFrame(
            b or [(None, None)], "k string, v int"
        ).filter("k is not null")
        commit_increment(
            partial_aggs(bdf, ["k"], measures),
            table,
            ["k"],
            num_buckets=4,
            overwrite=first,
        )
        first = False
    got = {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in materialize(spark, table, ["k"], measures).collect()
    }
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    per_key: dict[str, list] = {}
    for b in batches:
        for k, v in b:
            per_key.setdefault(k, []).append(v)
    exp = {}
    for k, vals in per_key.items():
        nn = [v for v in vals if v is not None]
        exp[k] = (
            len(nn),
            sum(nn) if nn else None,
            min(nn) if nn else None,
            max(nn) if nn else None,
        )
    assert got == exp, batches
