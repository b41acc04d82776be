"""Corrupt-JSON parsing pins (r14 lens, executed from the r15
candidate queue): Spark from_json (PERMISSIVE) vs DuckDB
json_extract on malformed/adversarial payloads. The registry's JSON
rows are green on clean data; these pins document where an oracle
restatement WOULD silently diverge the moment corrupt records enter
a corpus, so future JSON oracles are authored against the pinned
rules instead of rediscovering them as driver flakes.

Divergence table (pinned below):
- truncated/empty JSON: Spark yields an all-null struct (PERMISSIVE
  row survives); DuckDB's ::JSON cast THROWS — oracles must
  pre-filter with json_valid() or the whole query dies;
- duplicate keys: Spark keeps the LAST occurrence, DuckDB
  json_extract returns the FIRST — a corrupt producer that repeats a
  key flips values between engines;
- float into a LONG field: Spark nulls the field (strict schema),
  DuckDB try_cast ROUNDS (1.5 → 2) — restatements must try_cast to
  the exact Spark semantics (floor-check or strict integer regex),
  not a bare BIGINT cast;
- agreements (also pinned): int64 overflow → null in both;
  field-name matching is case-sensitive in both; a JSON null /
  top-level array yields null fields in both.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _spark_parse(spark, payloads):
    df = spark.createDataFrame([(p,) for p in payloads], "j string")
    rows = df.select(
        "j", F.from_json("j", "a long, b string").alias("s")
    ).collect()
    return {
        r["j"]: (None if r["s"] is None else (r["s"]["a"], r["s"]["b"]))
        for r in rows
    }


class TestCorruptJsonParity:
    def test_truncated_json_permissive_in_spark_throws_in_duckdb(
        self, spark
    ):
        got = _spark_parse(spark, ['{"a": 1, "b": "x"', ""])
        # PERMISSIVE: the row survives with null fields (Spark returns
        # an all-null struct for the truncated payload, a null struct
        # for the empty string)
        assert got['{"a": 1, "b": "x"'] == (None, None)
        assert got[""] is None
        con = duckdb.connect()
        with pytest.raises(duckdb.ConversionException):
            con.execute("""SELECT '{"a": 1, "b": "x"'::JSON""").fetchone()
        # the oracle-safe form: gate on json_valid
        ok = con.execute(
            """SELECT json_valid('{"a": 1, "b": "x"'), json_valid('{"a": 1}')"""
        ).fetchone()
        assert ok == (False, True)

    def test_duplicate_keys_last_wins_in_spark_first_in_duckdb(self, spark):
        payload = '{"a": 1, "a": 2, "b": "x"}'
        assert _spark_parse(spark, [payload])[payload] == (2, "x")
        du = duckdb.connect().execute(
            "SELECT CAST(json_extract(?::JSON, '$.a') AS BIGINT)", [payload]
        ).fetchone()[0]
        assert du == 1  # first occurrence

    def test_float_into_long_nulls_in_spark_rounds_in_duckdb(self, spark):
        payload = '{"a": 1.5, "b": "x"}'
        assert _spark_parse(spark, [payload])[payload] == (None, "x")
        du = duckdb.connect().execute(
            "SELECT try_cast(json_extract_string(?::JSON, '$.a') AS BIGINT)",
            [payload],
        ).fetchone()[0]
        assert du == 2  # DuckDB rounds — never restate with a bare cast

    def test_agreements_overflow_case_null_array(self, spark):
        payloads = [
            '{"a": 9223372036854775808, "b": "x"}',  # > int64
            '{"A": 1, "b": "x"}',  # case-sensitive miss
            "null",
            "[1,2]",
        ]
        got = _spark_parse(spark, payloads)
        assert got[payloads[0]] == (None, "x")
        assert got[payloads[1]] == (None, "x")
        assert got["null"] == (None, None)
        assert got["[1,2]"] == (None, None)
        con = duckdb.connect()
        assert con.execute(
            "SELECT try_cast(json_extract_string(?::JSON,'$.a') AS BIGINT)",
            [payloads[0]],
        ).fetchone()[0] is None
        assert con.execute(
            "SELECT json_extract(?::JSON, '$.a')", [payloads[1]]
        ).fetchone()[0] is None
