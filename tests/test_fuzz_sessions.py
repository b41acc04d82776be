"""Fuzz-parity lens, batch 9: session_window gap sessionization vs a
naive Python sessionizer over random event sets — multiple users,
duplicate timestamps, and offsets engineered to land EXACTLY on the
gap boundary (which merges: touching windows overlap, the pinned
semantics the batch lag-gap twin and the oracles encode as `>`)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GAP = 1800  # 30 minutes, the operator default

event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        # offsets as multiples of 600 s so exact-gap (1800) spacings
        # occur constantly, plus ±1 s jitter rows
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.sampled_from([-1, 0, 1]),
        ).map(lambda t: t[0] * 600 + t[1]),
    ),
    min_size=0,
    max_size=20,
)


@given(rows=event_rows)
@FUZZ
def test_fuzz_session_windows_match_naive(spark, rows):
    from pyspark.sql import functions as F

    from data_engineering_hs_spark.streaming.pipelines import (
        sessionized_counts,
    )

    base = 1_700_000_000
    df = spark.createDataFrame(
        [(u, base + off) for u, off in rows] or [(None, None)],
        "user_id int, epoch long",
    ).filter("user_id is not null").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    got = sorted(
        (r["user_id"], int(r["session_start"].timestamp()), r["n_events"])
        for r in sessionized_counts(df).collect()
    )
    per_user: dict[int, list[int]] = {}
    for u, off in rows:
        per_user.setdefault(u, []).append(base + off)
    exp = []
    for u, tss in per_user.items():
        tss.sort()
        start, n, prev = tss[0], 0, None
        for t in tss:
            if prev is not None and t - prev > GAP:  # exact gap MERGES
                exp.append((u, start, n))
                start, n = t, 0
            n += 1
            prev = t
        exp.append((u, start, n))
    assert got == sorted(exp), rows
