"""Map/struct/NaN-ordering parity pins (r14, from the r15 candidate
queue). All agreements — pinned so a config or engine change screams:

- duplicate map keys are LOUD in both engines (Spark under the
  default mapKeyDedupPolicy=EXCEPTION — pinned, because flipping the
  session policy to LAST_WIN would silently change every
  map-building query's semantics; DuckDB always raises);
- NaN inside a struct compares EQUAL to itself in both (normalized
  equality — this is why struct-keyed groupBys with NaN members
  behave identically);
- array_sort/list_sort place NaN LAST in both (NaN sorts greater
  than every real double — the same total order the top-k windows
  rely on).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F


class TestMapStructParity:
    def test_duplicate_map_keys_loud_in_both(self, spark):
        assert spark.conf.get("spark.sql.mapKeyDedupPolicy") == "EXCEPTION"
        from pyspark.errors import SparkRuntimeException

        with pytest.raises(SparkRuntimeException, match="DUPLICATED_MAP_KEY"):
            spark.sql("SELECT map('a',1,'a',2)").collect()
        with pytest.raises(SparkRuntimeException, match="DUPLICATED_MAP_KEY"):
            spark.sql("SELECT map_concat(map('a',1), map('a',2))").collect()
        with pytest.raises(duckdb.InvalidInputException):
            duckdb.connect().execute("SELECT MAP(['a','a'],[1,2])").fetchone()

    def test_struct_nan_equality_normalized_in_both(self, spark):
        sp = spark.sql(
            "SELECT named_struct('x', cast('NaN' as double)) = "
            "named_struct('x', cast('NaN' as double)) AS eq"
        ).collect()[0]["eq"]
        du = duckdb.connect().execute(
            "SELECT {'x': 'NaN'::DOUBLE} = {'x': 'NaN'::DOUBLE}"
        ).fetchone()[0]
        assert sp is True and du is True

    def test_array_sort_places_nan_last_in_both(self, spark):
        sp = spark.sql(
            "SELECT array_sort(array(cast('NaN' as double), 1.0, -1.0)) AS a"
        ).collect()[0]["a"]
        assert sp[:2] == [-1.0, 1.0] and math.isnan(sp[2])
        du = duckdb.connect().execute(
            "SELECT list_sort(['NaN'::DOUBLE, 1.0, -1.0])"
        ).fetchone()[0]
        assert du[:2] == [-1.0, 1.0] and math.isnan(du[2])
