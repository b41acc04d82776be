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
