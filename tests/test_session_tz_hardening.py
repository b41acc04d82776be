"""Session-timezone hardening pins (r14 tz-lens residual axis).

get_spark pins spark.sql.session.timeZone=UTC and load_table re-pins
defensively, but the text readers are callable with a FOREIGN session.
Naive timestamp strings in CSV/JSON parse under the session zone by
default — a caller session left on, say, Australia/Lord_Howe (+10:30,
and a :30 zone catches half-hour bugs whole-hour zones mask) would
silently shift every parsed instant by the offset. The readers
therefore pass a per-read timeZone option (default UTC = the engine
contract, overridable for genuinely local-time files); write_csv
formats symmetrically so round-trips are lossless.

Everything else reachable without load_table is instant-based
(F.window / session_window / current_timestamp / binary comparisons)
and tz-independent — grep-audited in r14; flatten_orders keeps
created_at as a string deliberately.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

HOSTILE = "Australia/Lord_Howe"
# '2024-06-01 12:00:00' as a UTC instant
EPOCH_UTC = 1717243200


@pytest.fixture()
def hostile_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", HOSTILE)
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


TS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


class TestReaderTzPins:
    def test_csv_naive_timestamp_parses_utc_under_foreign_session(
        self, hostile_tz, tmp_path
    ):
        from data_engineering_hs_spark.sources.csv import read_headerless

        p = tmp_path / "t.csv"
        p.write_text("1,2024-06-01 12:00:00\n")
        df = read_headerless(hostile_tz, str(p), TS_SCHEMA)
        [(epoch,)] = df.selectExpr("cast(ts as long)").collect()
        assert epoch == EPOCH_UTC

    def test_csv_header_reader_same_pin(self, hostile_tz, tmp_path):
        from data_engineering_hs_spark.sources.csv import read_with_header

        p = tmp_path / "t.csv"
        p.write_text("id,ts\n1,2024-06-01 12:00:00\n")
        df = read_with_header(hostile_tz, str(p), schema=TS_SCHEMA)
        [(epoch,)] = df.selectExpr("cast(ts as long)").collect()
        assert epoch == EPOCH_UTC

    def test_jsonl_naive_timestamp_parses_utc(self, hostile_tz, tmp_path):
        from data_engineering_hs_spark.sources.json import read_jsonl

        p = tmp_path / "t.jsonl"
        p.write_text('{"id": 1, "ts": "2024-06-01 12:00:00"}\n')
        df = read_jsonl(hostile_tz, str(p), TS_SCHEMA)
        [(epoch,)] = df.selectExpr("cast(ts as long)").collect()
        assert epoch == EPOCH_UTC

    def test_csv_round_trip_lossless_under_foreign_session(
        self, hostile_tz, tmp_path
    ):
        from data_engineering_hs_spark.sources.csv import (
            read_with_header,
            write_csv,
        )

        src = hostile_tz.createDataFrame(
            [(1, EPOCH_UTC)], "id long, epoch long"
        ).selectExpr("id", "timestamp_seconds(epoch) as ts")
        out = str(tmp_path / "rt")
        write_csv(src, out)
        back = read_with_header(hostile_tz, out, schema=TS_SCHEMA)
        [(epoch,)] = back.selectExpr("cast(ts as long)").collect()
        assert epoch == EPOCH_UTC

    def test_override_for_genuinely_local_files(self, hostile_tz, tmp_path):
        """tz= is a real knob, not decoration: parsing the same naive
        string as Tokyo time lands 9 hours earlier on the epoch."""
        from data_engineering_hs_spark.sources.csv import read_headerless

        p = tmp_path / "t.csv"
        p.write_text("1,2024-06-01 12:00:00\n")
        df = read_headerless(
            hostile_tz, str(p), TS_SCHEMA, tz="Asia/Tokyo"
        )
        [(epoch,)] = df.selectExpr("cast(ts as long)").collect()
        assert epoch == EPOCH_UTC - 9 * 3600
