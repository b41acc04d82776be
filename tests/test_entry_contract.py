"""__spark_entry__ contract pins: ordering, completeness, hygiene."""

from __future__ import annotations

import __spark_entry__ as E
from data_engineering_hs_spark.queries import REGISTRY


def test_queries_is_complete_permutation():
    names = list(E.queries())
    assert sorted(names) == sorted(REGISTRY)
    assert set(E.oracle_sql()) == {
        n for n, q in REGISTRY.items() if q.oracle is not None
    }


def test_never_driver_verified_queries_come_first():
    names = list(E.queries())
    seen_verified = False
    for n in names:
        if n in E._R01_VERIFIED:
            seen_verified = True
        else:
            assert not seen_verified, f"unverified {n} after a verified entry"


def test_measured_table_has_no_stale_names():
    assert set(E._MEASURED_SEC) <= set(REGISTRY)


def test_import_does_not_enable_table_cache():
    # the cache must switch on only when a driver callable RUNS —
    # an import-time enable leaks InMemoryRelations into every later
    # test module and breaks the parquet plan-shape assertions
    from data_engineering_hs_spark import catalog

    assert not catalog._TABLE_CACHE_ENABLED


def test_oracle_hash_sidecar_flags_stale_oracles():
    # ORACLE_HASHES.json certifies (query, oracle-text) pairs: a name
    # counts driver-verified only when its stamped hash matches the
    # CURRENT oracle text. Here the 17 round-8 archaeology names must
    # stay out of _R01_VERIFIED until the driver re-checks them.
    import json
    import os

    here = os.path.dirname(os.path.abspath(E.__file__))
    stamped = json.load(open(os.path.join(here, "ORACLE_HASHES.json")))
    for name in E._R01_VERIFIED:
        assert stamped[name] == E._oracle_hash(name)
    # the known stale set (oracle added/edited after last green row)
    for name in ("a_approx_quantiles", "t_quality_score", "t_langid",
                 "d_simhash_pairs", "w_mom_growth", "t_quality_buckets"):
        assert name not in E._R01_VERIFIED, name


def test_oracle_hash_mismatch_forces_recheck(monkeypatch):
    # Flip one stamped hash and re-derive: that name must drop out.
    victim = sorted(E._R01_VERIFIED)[0]
    import json
    import os

    here = os.path.dirname(os.path.abspath(E.__file__))
    path = os.path.join(here, "ORACLE_HASHES.json")
    side = json.load(open(path))
    real = E._driver_verified()
    assert victim in real
    side[victim] = "0" * 64
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # point the loader at a copy with the poisoned entry
        for f in os.listdir(here):
            if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
                os.symlink(os.path.join(here, f), os.path.join(td, f))
        json.dump(side, open(os.path.join(td, "ORACLE_HASHES.json"), "w"))
        monkeypatch.setattr(
            os.path, "dirname", lambda p, _d=os.path.dirname: td
            if p == os.path.abspath(E.__file__)
            else _d(p),
        )
        assert victim not in E._driver_verified()
