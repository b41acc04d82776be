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
    # r7: the LSH/ANN/packing set converted to invariant-audit
    # oracles (recall vs exact truth, planted-dup completeness,
    # conservation laws); t_curate_training_set to a full composed
    # stage-by-stage restatement; st_session_windows to the lag-gap
    # batch restatement (end = last event + gap). The one query left
    # is irreducible BY DESIGN: d_minhash_lsh emits raw xxhash64
    # candidate pairs (the bench headline — kept as raw output so
    # the benchmark measures the real operator, while its planted
    # completeness is hash-checked by d_minhash_lsh_audit).
    "d_minhash_lsh": (25, "99ec31279b9c097cd9e63d2c39396317"),
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
