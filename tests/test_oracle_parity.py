"""Every registered query with an oracle must match DuckDB exactly at
sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from data_engineering_hs_spark.queries import REGISTRY, load_all
from tests.conftest import SF001
from tests.oracle_harness import compare_query

load_all()

ALL_QUERIES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, name):
    problems = compare_query(spark, name, SF001)
    assert not problems, f"{name}: " + "; ".join(problems)
