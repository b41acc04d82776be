"""Pinned golden outputs for every oracle=None registry query.

These queries can't be DuckDB-checked (hash-family-specific seeds,
approximate sketches, Spark-specific session windows), but they ARE
deterministic: seeded hashing + integer-scaled aggregation makes the
output bit-identical across runs, partitionings (verified at
shuffle.partitions 8 and 17, local[8] and local[4]), and sessions.
So each gets a hard expected-output check — row count + md5 of the
canonicalized rows (same canonicalization as the oracle harness) —
not just the property tests in test_quality_ops.

If an intentional algorithm change moves a hash, regenerate with:
    python -c "<loop over REGISTRY oracle=None entries printing
    len(pdf) + md5(repr(_canon_df(pdf)))>"   # see git log
and update the table BOTH here and in the commit message rationale.
"""

from __future__ import annotations

import hashlib

import pytest

from data_engineering_hs_spark.queries import REGISTRY, load_all
from tests.conftest import SF001
from tests.oracle_harness import _canon_df

load_all()

# (row_count, md5 of canonicalized rows) at sf0.01
GOLDENS = {
    # o_sample_deterministic + t_langid converted to hard DuckDB
    # oracles in r6 (md5 ordering hash / term-by-term SQL restatement)
    "d_minhash_lsh": (25, "99ec31279b9c097cd9e63d2c39396317"),
    "s_ivf_topk": (25, "eb7290e7dc44a1aa02b16d5450061348"),
    "s_lsh_topk": (25, "51893cf9ec4ef936209eabb25a8c3986"),
    # fold-path hash; the arrow dot_strategy shifts cos_sim by ulps
    # (pair SET unchanged — 40 rows both ways, hash 0131fda1...)
    "s_embedding_near_dup": (40, "c776fad1ffa2f66491aa2e5fa0cc7b66"),
    "st_session_windows": (9549, "fde46ec19869239d8247e71de6c02bfb"),
    "d_winnow_fingerprints": (10137, "64a9cf95b131fb48f37450a5437f4be9"),
    "d_dup_components_lsh": (47, "2da4aae7ea87bbf8629e1aab66d58e6d"),
    "d_incremental_lsh": (19, "45d39582841ab37dbdafa3d10da289ba"),
    # regenerated r6: chunk_uid widened to shiftleft(doc_id,32)+chunk_id
    # (collision-proof uid space; packing itself unchanged)
    "t_pack_contexts": (694, "06cf31054289bcad14704d28e0cf82a4"),
    "t_curate_training_set": (160, "61395cfaca53fecd1bdae6179734332e"),
}


def test_goldens_cover_every_no_oracle_query():
    no_oracle = {n for n, q in REGISTRY.items() if q.oracle is None}
    assert no_oracle == set(GOLDENS), (
        "every oracle=None query needs a golden: "
        f"missing={no_oracle - set(GOLDENS)} stale={set(GOLDENS) - no_oracle}"
    )


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_no_oracle_query_matches_golden(spark, name):
    pdf = REGISTRY[name].fn(spark, SF001).toPandas()
    cols, rows = _canon_df(pdf)
    digest = hashlib.md5(repr((cols, rows)).encode()).hexdigest()
    exp_rows, exp_digest = GOLDENS[name]
    assert len(pdf) == exp_rows, f"{name}: rows {len(pdf)} != {exp_rows}"
    assert digest == exp_digest, f"{name}: value hash drifted"
