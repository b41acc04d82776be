"""Fuzz-parity lens, batch 8: upsert_parquet's insert-if-absent
contract replayed over random batch sequences — first batch to
introduce a key owns it forever, within-batch duplicate keys keep
exactly one arbitrary survivor, replays append nothing, and the
returned count is exactly the number of NEW keys."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

batches_strategy = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # key (collisions likely)
            st.integers(min_value=0, max_value=99),  # value
        ),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@given(batches=batches_strategy, replay=st.booleans())
@FUZZ
def test_fuzz_upsert_insert_if_absent(spark, batches, replay, tmp_path_factory):
    from data_engineering_hs_spark.sources.upsert import upsert_parquet

    target = str(tmp_path_factory.mktemp("upsert") / "t")
    owner: dict[int, set[int]] = {}  # key -> values of the OWNING batch
    seen: set[int] = set()
    for b in batches:
        bdf = spark.createDataFrame(
            b or [(None, None)], "k int, v int"
        ).filter("k is not null")
        new_keys = {k for k, _ in b} - seen
        n = upsert_parquet(spark, target, bdf, ["k"])
        assert n == len(new_keys), (batches, b)
        for k, v in b:
            if k in new_keys:
                owner.setdefault(k, set()).add(v)
        seen |= new_keys
        if replay:
            # a replayed batch (crash-recovery) must append nothing
            assert upsert_parquet(spark, target, bdf, ["k"]) == 0
    if not seen:
        return
    rows = spark.read.parquet(target).collect()
    got = {}
    for r in rows:
        assert r["k"] not in got, ("duplicate key in target", batches)
        got[r["k"]] = r["v"]
    assert set(got) == seen
    for k, v in got.items():
        # the surviving value comes from the batch that introduced the
        # key (within-batch survivor is arbitrary by contract)
        assert v in owner[k], (batches, k, v)
