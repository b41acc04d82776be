"""Cross-engine NULL semantics: the driver testdata contains no NULLs,
so these micro-fixtures pin Spark-vs-DuckDB agreement on the classic
traps — aggregates over NULLs, null join keys, DISTINCT with NULLs,
null ordering — using the same canonicalization as the oracle harness."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from tests.oracle_harness import _canon_df

ROWS = [
    ("a", 1, 10.0),
    ("a", None, 20.0),
    ("b", 3, None),
    (None, 4, 40.0),
    (None, None, None),
    ("b", 3, 30.0),
]
SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
    ]
)


@pytest.fixture()
def fixtures(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    spark.read.parquet(p).createOrReplaceTempView("t")
    return spark, con


def _compare(spark, con, sql: str):
    s_cols, s_rows = _canon_df(spark.sql(sql).toPandas())
    o_cols, o_rows = _canon_df(con.execute(sql).df())
    assert s_cols == o_cols
    assert s_rows == o_rows


class TestNullSemantics:
    def test_aggregates_skip_nulls(self, fixtures):
        spark, con = fixtures
        _compare(
            spark,
            con,
            """
            SELECT k,
                   COUNT(*) AS n_rows,
                   COUNT(v) AS n_v,
                   COUNT(DISTINCT v) AS nd_v,
                   CAST(SUM(v) AS BIGINT) AS sum_v,
                   CAST(SUM(CAST(round(x * 100) AS BIGINT)) AS BIGINT) AS sum_x_cents
            FROM t GROUP BY k
            """,
        )

    def test_group_by_null_key_is_a_group(self, fixtures):
        spark, con = fixtures
        _compare(
            spark, con,
            "SELECT k, COUNT(*) AS n FROM t GROUP BY k",
        )

    def test_distinct_keeps_one_null(self, fixtures):
        spark, con = fixtures
        _compare(spark, con, "SELECT DISTINCT k FROM t")
        _compare(spark, con, "SELECT DISTINCT k, v FROM t")

    def test_null_join_keys_never_match(self, fixtures):
        spark, con = fixtures
        _compare(
            spark,
            con,
            """
            SELECT a.k AS ak, a.v AS av, b.v AS bv
            FROM t a JOIN t b ON a.k = b.k AND a.v = b.v
            """,
        )

    def test_left_join_null_fill_and_coalesce(self, fixtures):
        spark, con = fixtures
        _compare(
            spark,
            con,
            """
            SELECT a.v AS av, COALESCE(b.x, -1.0) AS bx
            FROM t a LEFT JOIN (SELECT v, x FROM t WHERE x > 15) b
              ON a.v = b.v
            """,
        )

    def test_where_null_comparisons_filter_out(self, fixtures):
        spark, con = fixtures
        _compare(spark, con, "SELECT k, v FROM t WHERE v > 0")
        _compare(spark, con, "SELECT k, v FROM t WHERE v IS NULL")
        _compare(spark, con, "SELECT k, v FROM t WHERE k IS NOT NULL AND v IS NOT NULL")

    def test_order_by_nulls_position(self, fixtures):
        spark, con = fixtures
        # Spark default: NULLS FIRST asc; DuckDB default: NULLS LAST.
        # The engine always writes explicit NULLS FIRST/LAST — pinned
        # here in both directions.
        _compare(
            spark, con,
            "SELECT k, v FROM t ORDER BY v ASC NULLS FIRST, k ASC NULLS FIRST",
        )
        _compare(
            spark, con,
            "SELECT k, v FROM t ORDER BY v DESC NULLS LAST, k DESC NULLS LAST",
        )

    def test_avg_of_all_null_group_is_null(self, fixtures):
        spark, con = fixtures
        _compare(
            spark,
            con,
            """
            SELECT k, CAST(SUM(x) AS DOUBLE) AS s, COUNT(x) AS c
            FROM (SELECT k, x FROM t WHERE k IS NULL) GROUP BY k
            """,
        )
