"""Property-based tests (hypothesis) for engine invariants that must
hold on arbitrary inputs: the Avro codec round-trip, money-cents
determinism, retry policy bounds, and text expression edge cases."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_hs_spark.sources import avro as A
from data_engineering_hs_spark.sources.rest import fetch_with_retry

EVENT_SCHEMA = {
    "type": "record",
    "name": "E",
    "fields": [
        {"name": "user", "type": "string"},
        {"name": "event", "type": ["null", "string"]},
        {"name": "amount", "type": "double"},
        {"name": "n", "type": "long"},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
    ],
}

records = st.fixed_dictionaries(
    {
        "user": st.text(max_size=50),
        "event": st.one_of(st.none(), st.text(max_size=20)),
        "amount": st.floats(allow_nan=False, allow_infinity=False),
        "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "flag": st.booleans(),
        "blob": st.binary(max_size=64),
    }
)


class TestAvroCodecProperties:
    @given(rec=records)
    @settings(max_examples=200, deadline=None)
    def test_schemaless_roundtrip(self, rec):
        got = A.decode_record(A.encode_record(rec, EVENT_SCHEMA), EVENT_SCHEMA)
        assert got == rec

    @given(recs=st.lists(records, max_size=20))
    @settings(max_examples=50, deadline=None)
    def test_container_roundtrip(self, recs, tmp_path_factory):
        p = str(tmp_path_factory.mktemp("avro") / "f.avro")
        A.write_container(p, recs, EVENT_SCHEMA)
        with open(p, "rb") as f:
            schema, got = A.read_container_bytes(f.read())
        assert got == recs
        assert schema["name"] == "E"

    @given(n=st.integers(min_value=-(2**63), max_value=2**63 - 1))
    @settings(max_examples=500, deadline=None)
    def test_zigzag_roundtrip(self, n):
        import io

        assert A._zigzag_decode(io.BytesIO(A._zigzag_encode(n))) == n


class TestMoneyCentsProperty:
    @given(
        cents=st.integers(min_value=0, max_value=10**12),
    )
    @settings(max_examples=500, deadline=None)
    def test_round_to_cents_inverts_2dp_doubles(self, cents):
        # Any 2-dp-by-contract amount stored as double survives the
        # cents round-trip exactly (the engine's aggregation contract).
        amount = cents / 100.0
        assert round(amount * 100) == cents
        assert math.isclose(round(amount * 100) / 100.0, amount, rel_tol=0, abs_tol=0)


class TestRetryPolicyProperties:
    @given(
        fails=st.lists(
            st.sampled_from([429, 500, 502, 503]), min_size=0, max_size=6
        ),
        max_attempts=st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=100, deadline=None)
    def test_attempts_never_exceed_budget(self, fails, max_attempts):
        calls = {"n": 0}

        def transport(url):
            calls["n"] += 1
            i = calls["n"] - 1
            if i < len(fails):
                return fails[i], {"Retry-After": "0"}, ""
            return 200, {}, "{}"

        status, attempts, _ = fetch_with_retry(
            "http://x/item/1", transport, max_attempts=max_attempts,
            backoff_base=0.0,
        )
        assert attempts <= max_attempts
        assert calls["n"] <= max_attempts
        if len(fails) < max_attempts:
            assert status == 200
