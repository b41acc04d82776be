"""Property-based cross-engine fuzz: hypothesis generates micro-tables
(with NULLs, duplicates, empty groups), and a battery of SQL templates
runs on BOTH Spark and DuckDB with canonical-compare — a broader
semantics net than the fixed-corpus oracle queries."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tests.oracle_harness import _canon_df

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("g", T.IntegerType()),
        T.StructField("v", T.LongType()),
    ]
)

rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    ),
    min_size=0,
    max_size=25,
)

TEMPLATES = [
    "SELECT k, COUNT(*) AS n, COUNT(v) AS nv, CAST(SUM(v) AS BIGINT) AS sv FROM t GROUP BY k",
    "SELECT k, g, COUNT(DISTINCT v) AS ndv FROM t GROUP BY k, g",
    "SELECT DISTINCT k, g FROM t",
    "SELECT k, v FROM t WHERE v > 0 AND k IS NOT NULL",
    """SELECT a.k AS k, a.v AS av, b.v AS bv
       FROM t a JOIN t b ON a.k = b.k AND a.g = b.g""",
    """SELECT k, CAST(SUM(v) AS BIGINT) AS sv FROM t GROUP BY k
       HAVING COUNT(*) >= 2""",
    """SELECT k, g, v FROM t
       ORDER BY k ASC NULLS FIRST, g ASC NULLS FIRST, v ASC NULLS FIRST
       LIMIT 5""",
    "SELECT COALESCE(k, 'missing') AS k2, COUNT(*) AS n FROM t GROUP BY COALESCE(k, 'missing')",
    """SELECT k, g, v,
       ROW_NUMBER() OVER (PARTITION BY k
                          ORDER BY g ASC NULLS FIRST, v ASC NULLS FIRST) AS rn
       FROM t""",
    "SELECT k, v, CAST(SUM(v) OVER (PARTITION BY k) AS BIGINT) AS s FROM t",
]


class TestRelationalFuzz:
    @given(data=rows)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_templates_agree(self, spark, data, tmp_path_factory):
        # Both engines read the SAME typed parquet — registering a
        # pandas frame would degrade nullable ints to float64 and
        # compare the degradation, not the engines.
        p = str(tmp_path_factory.mktemp("fuzz") / "t.parquet")
        sdf = spark.createDataFrame(data, SCHEMA)
        sdf.coalesce(1).write.parquet(p)
        spark.read.parquet(p).createOrReplaceTempView("t")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
        for sql in TEMPLATES:
            s_cols, s_rows = _canon_df(spark.sql(sql).toPandas())
            o_cols, o_rows = _canon_df(con.execute(sql).df())
            assert s_cols == o_cols, (sql, s_cols, o_cols)
            if "LIMIT" in sql:
                # LIMIT without total order can legitimately differ in
                # WHICH rows it returns only if ties exist beyond the
                # sort keys; our sort covers all columns → exact.
                pass
            assert s_rows == o_rows, (sql, data, s_rows[:5], o_rows[:5])
        con.close()
