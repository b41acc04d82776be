from __future__ import annotations

import pytest

from data_engineering_hs_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests")
    s.sparkContext.setLogLevel("WARN")
    yield s
