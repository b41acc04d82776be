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


class TestChunkPackProperties:
    """Spark chunking/packing vs a pure-Python reference model on
    hypothesis-generated corpora (one Spark job per example — keep
    max_examples small)."""

    @staticmethod
    def _ref_chunks(words, chunk, overlap):
        n = len(words)
        if n == 0:
            return []
        stride = chunk - overlap
        starts = [
            s for s in range(1, n + 1, stride) if s == 1 or s <= n - overlap
        ]
        return [
            (i, " ".join(words[s - 1 : s - 1 + chunk]), min(chunk, n - s + 1))
            for i, s in enumerate(starts)
        ]

    @st.composite
    def _chunk_params(draw):
        chunk = draw(st.integers(min_value=2, max_value=12))
        overlap = draw(st.integers(min_value=0, max_value=chunk - 1))
        docs = draw(
            st.lists(
                st.lists(
                    st.sampled_from(["a", "b", "cc", "ddd"]), max_size=30
                ),
                min_size=1,
                max_size=6,
            )
        )
        return chunk, overlap, docs

    @given(params=_chunk_params())
    @settings(max_examples=12, deadline=None)
    def test_chunking_matches_reference(self, spark, params):
        from data_engineering_hs_spark.operators.corpus import chunk_documents

        chunk, overlap, docs = params
        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(docs)],
            ["doc_id", "text"],
        )
        got = {
            (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
            for r in chunk_documents(
                df, chunk_tokens=chunk, overlap=overlap
            ).collect()
        }
        want = {}
        for i, ws in enumerate(docs):
            for cid, text, ntok in self._ref_chunks(ws, chunk, overlap):
                want[(i, cid)] = (text, ntok)
        assert got == want

    @given(
        sizes=st.lists(
            st.integers(min_value=1, max_value=900), min_size=1, max_size=60
        ),
        target=st.integers(min_value=50, max_value=1000),
    )
    @settings(max_examples=10, deadline=None)
    def test_packing_invariants(self, spark, sizes, target):
        from data_engineering_hs_spark.operators.corpus import pack_sequences

        df = spark.createDataFrame(
            list(enumerate(sizes)), ["doc_id", "n_tokens"]
        )
        out = pack_sequences(df, target=target, shards=4).collect()
        assert len(out) == len(sizes)  # nothing dropped
        by_bin = {}
        for r in out:
            by_bin.setdefault((r.shard, r.bin_id), []).append(r)
        for members in by_bin.values():
            total = sum(m.size for m in members)
            if len(members) > 1:
                assert total <= target  # capacity only breached by a
                # singleton oversize item
            ids = sorted(m.id for m in members)
        # bins are contiguous id-runs within each shard (greedy order)
        for shard in {r.shard for r in out}:
            rows = sorted(
                (r for r in out if r.shard == shard), key=lambda r: r.id
            )
            bin_seq = [r.bin_id for r in rows]
            assert bin_seq == sorted(bin_seq)


class TestCmsProperties:
    @given(
        st.lists(
            st.integers(min_value=0, max_value=50), min_size=1, max_size=80
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_estimate_never_underestimates(self, spark, keys):
        from collections import Counter

        from data_engineering_hs_spark.operators.sketch import (
            cms_build,
            cms_estimate,
        )

        df = spark.createDataFrame([(k,) for k in keys], ["k"])
        sk = cms_build(df, "k", depth=3, width=64)
        est = {
            r["k"]: r["est"]
            for r in cms_estimate(sk, df, "k", depth=3, width=64).collect()
        }
        exact = Counter(keys)
        for k, n in exact.items():
            assert est[k] >= n, (k, n, est[k])


class TestTwoLevelAssignmentProperty:
    @given(st.integers(min_value=0, max_value=2**31 - 1))
    @settings(max_examples=6, deadline=None)
    def test_full_probe_equals_flat_on_random_data(self, spark, seed):
        # GUARANTEE under audit (s_hier_assign): probing every
        # super-group restores the full candidate set, so two-level
        # assignment equals flat bit-for-bit — (cluster, c_sim) both —
        # for ANY data, not just separated clusters.
        import numpy as np

        from data_engineering_hs_spark.operators.similarity import (
            assign_nearest_centroid,
        )

        rng = np.random.default_rng(seed)
        n, k, dim = 40, 7, 5
        vecs = rng.normal(size=(n, dim))
        cents_m = rng.normal(size=(k, dim))
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(j, [float(x) for x in cents_m[j]]) for j in range(k)],
            "label int, centroid array<double>",
        )
        flat = sorted(
            (r.vec_id, r.cluster, r.c_sim)
            for r in assign_nearest_centroid(df, cents).collect()
        )
        for super_k in (2, 3, k):
            two = sorted(
                (r.vec_id, r.cluster, r.c_sim)
                for r in assign_nearest_centroid(
                    df, cents, super_k=super_k, probe_supers=super_k
                ).collect()
            )
            assert two == flat, (seed, super_k)
