"""Malformed-CSV parsing pins (r15 lens, the last unprobed
cross-engine boundary from the r15 queue): Spark's PERMISSIVE CSV
reader vs DuckDB read_csv on truncated rows, wrong-arity rows, quote
damage, embedded newlines, and type failures. No registry row reads
malformed CSV today; these pins document where a future CSV oracle
WOULD silently diverge the moment dirty files enter a corpus, so it
is authored against the pinned rules instead of rediscovered as a
driver flake (the corrupt-JSON lens discipline).

Divergence table (each pinned below):
- SHORT row (missing columns): Spark PERMISSIVE null-PADS the
  missing fields and keeps the row (flagged corrupt); DuckDB rejects
  it (ignore_errors drops; null_padding=true + ignore_errors pads —
  the ONLY repaired shape the engines share).
- LONG row (extra columns): Spark keeps the parsed PREFIX (flagged
  corrupt); DuckDB drops it even under null_padding + ignore_errors
  (error_type 'TOO MANY COLUMNS' in store_rejects).
- UNCLOSED QUOTE: Spark consumes to end of LINE as the field value
  (row kept, flagged corrupt). DuckDB: FOUR outcomes by option set —
  strict throws; ignore_errors drops the WHOLE scan's rows (the
  damage poisons even clean neighbors); store_rejects keeps clean
  rows and quarantines the damaged one; and the auto-detect sniffer
  on a damaged file silently DISABLES quoting, re-parsing the quote
  as a literal char with the tail landing in the NEXT field — a
  fully "successful" row Spark never sees.
- EMBEDDED NEWLINE in a quoted field: Spark default
  (multiLine=false) SHREDS the row into two garbage fragments;
  DuckDB handles it natively. Agreement requires multiLine=true.
- TYPE FAILURE into BIGINT: Spark nulls only the failing field
  ('1.5' → NULL — no rounding, row flagged corrupt); DuckDB
  try_cast ROUNDS ('1.5' → 2) — same divergence class as the JSON
  lens's float-into-long pin.
- badRecordsPath: OPEN-SOURCE Spark silently IGNORES the option (no
  quarantine dir is created, all rows stay in the output) — it is a
  Databricks-runtime feature; never rely on it for quarantine.

Oracle-authoring rule distilled: a malformed-CSV row has NO
cross-engine-stable repaired shape except null-padded short rows.
A CSV pipeline oracle must compare only the CLEAN subset (Spark:
corrupt column IS NULL — sources.csv.read_with_quarantine; DuckDB:
strict read with store_rejects/ignore_errors), and the quarantine
contract is row COUNTS per error class, not row contents.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_hs_spark.sources.csv import (
    CORRUPT_COL,
    read_with_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),
    ]
)
DUCK_COLS = "columns={'a':'BIGINT','b':'VARCHAR','c':'DOUBLE'}"
DUCK_OPTS = (
    f"{DUCK_COLS}, header=true, auto_detect=false, delim=',', quote='\"'"
)


def _write(tmp_path, name: str, body: str) -> str:
    p = str(tmp_path / name)
    with open(p, "w") as fh:
        fh.write(body)
    return p


def _spark_rows(spark, path, **kw):
    clean, quar = read_with_quarantine(spark, path, SCHEMA, **kw)
    return (
        sorted(tuple(r) for r in clean.collect()),
        sorted(
            (r[CORRUPT_COL], r["a"], r["b"], r["c"]) for r in quar.collect()
        ),
    )


class TestArityDivergence:
    BODY = "a,b,c\n1,x,2.5\n2,y\n3,z,4.5,EXTRA\n4,w,5.5\n"

    def test_spark_pads_short_and_prefixes_long(self, spark, tmp_path):
        p = _write(tmp_path, "arity.csv", self.BODY)
        clean, quar = _spark_rows(spark, p)
        assert clean == [(1, "x", 2.5), (4, "w", 5.5)]
        # short row: null-padded; long row: parsed prefix kept — both
        # carry the raw line in the corrupt column
        assert quar == [
            ("2,y", 2, "y", None),
            ("3,z,4.5,EXTRA", 3, "z", 4.5),
        ]

    def test_duckdb_drops_by_default_pads_only_short(self, tmp_path):
        p = _write(tmp_path, "arity.csv", self.BODY)
        con = duckdb.connect()
        # ignore_errors: BOTH arity classes dropped
        got = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_OPTS}, ignore_errors=true)"
        ).fetchall()
        assert sorted(got) == [(1, "x", 2.5), (4, "w", 5.5)]
        # null_padding repairs the SHORT row to Spark's padded shape;
        # the LONG row is still dropped (no cross-engine repair)
        padded = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_OPTS}, "
            "null_padding=true, ignore_errors=true)"
        ).fetchall()
        assert sorted(padded, key=lambda r: r[0]) == [
            (1, "x", 2.5),
            (2, "y", None),
            (4, "w", 5.5),
        ]

    def test_duckdb_store_rejects_is_the_quarantine_analog(self, tmp_path):
        p = _write(tmp_path, "arity.csv", self.BODY)
        con = duckdb.connect()
        kept = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_OPTS}, store_rejects=true)"
        ).fetchall()
        assert sorted(kept) == [(1, "x", 2.5), (4, "w", 5.5)]
        rejects = con.execute(
            "SELECT csv_line, error_type FROM reject_errors ORDER BY csv_line"
        ).fetchall()
        assert [(l, str(t)) for l, t in rejects] == [
            ("2,y", "MISSING COLUMNS"),
            ("3,z,4.5,EXTRA", "TOO MANY COLUMNS"),
        ]


class TestQuoteDamage:
    def test_unclosed_quote_two_engines_two_different_rows(
        self, spark, tmp_path
    ):
        # the nastiest class: NEITHER engine errors, each "repairs"
        # differently — Spark eats to end of line, DuckDB treats the
        # quote as a literal char and lands 5.5 in c
        body = 'a,b,c\n1,x,2.5\n4,"unclosed quote,5.5\n'
        p = _write(tmp_path, "quote.csv", body)
        clean, quar = _spark_rows(spark, p)
        assert clean == [(1, "x", 2.5)]
        assert quar == [
            ('4,"unclosed quote,5.5', 4, "unclosed quote,5.5", None)
        ]
        con = duckdb.connect()
        # DuckDB, same explicit quote char, FOUR different outcomes
        # by option set:
        # (a) strict: loud error naming the line
        with pytest.raises(duckdb.InvalidInputException, match="unterminated"):
            con.execute(f"SELECT * FROM read_csv('{p}', {DUCK_OPTS})")
        # (b) ignore_errors: the unterminated quote poisons the WHOLE
        # scan — even the clean preceding row is dropped
        got = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_OPTS}, ignore_errors=true)"
        ).fetchall()
        assert got == []
        # (c) store_rejects: clean row kept, damaged row quarantined
        kept = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_OPTS}, store_rejects=true)"
        ).fetchall()
        assert kept == [(1, "x", 2.5)]
        assert (
            con.execute("SELECT COUNT(*) FROM reject_errors").fetchone()[0]
            == 1
        )
        # (d) quoting DISABLED (what the sniffer silently picks on a
        # damaged file): the quote re-parses as a literal char and
        # 5.5 lands in c — a fully "successful" row Spark never sees
        lit = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_COLS}, header=true, "
            "auto_detect=false, delim=',', quote='', ignore_errors=true)"
        ).fetchall()
        assert sorted(lit) == [(1, "x", 2.5), (4, '"unclosed quote', 5.5)]
        # → a value-level oracle on quote-damaged CSV is IMPOSSIBLE;
        # only Spark's clean subset vs DuckDB store_rejects pairs up


class TestEmbeddedNewline:
    BODY = 'a,b,c\n1,"line1\nline2",2.5\n2,plain,3.5\n'

    def test_agreement_requires_multiline_true(self, spark, tmp_path):
        p = _write(tmp_path, "nl.csv", self.BODY)
        # multiLine=true: Spark clean == DuckDB native, row for row
        clean, quar = _spark_rows(spark, p, multi_line=True)
        assert clean == [(1, "line1\nline2", 2.5), (2, "plain", 3.5)]
        assert quar == []
        con = duckdb.connect()
        got = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_OPTS})"
        ).fetchall()
        assert sorted(got) == clean

    def test_spark_default_shreds_the_quoted_row(self, spark, tmp_path):
        p = _write(tmp_path, "nl.csv", self.BODY)
        clean, quar = _spark_rows(spark, p)  # multiLine=False default
        # the real (1, line1\nline2, 2.5) row is GONE — two corrupt
        # fragments quarantine instead; only the plain row survives
        assert clean == [(2, "plain", 3.5)]
        assert [q[0] for q in quar] == ['1,"line1', 'line2",2.5']


class TestTypeFailure:
    BODY = "a,b,c\n5,w,notanumber\n1.5,q,2.0\n"

    def test_spark_nulls_field_duckdb_trycast_rounds(self, spark, tmp_path):
        p = _write(tmp_path, "type.csv", self.BODY)
        clean, quar = _spark_rows(spark, p)
        assert clean == []
        # Spark nulls ONLY the failing field and keeps the rest;
        # '1.5' into BIGINT is NULL — no rounding
        assert quar == [
            ("1.5,q,2.0", None, "q", 2.0),
            ("5,w,notanumber", 5, "w", None),
        ]
        con = duckdb.connect()
        # the read-as-varchar + try_cast restatement ROUNDS 1.5 → 2
        # (same class as the JSON lens float-into-long pin): a CSV
        # oracle must NOT restate Spark's typed read with try_cast
        got = con.execute(
            "SELECT try_cast(a AS BIGINT), b, try_cast(c AS DOUBLE) "
            f"FROM read_csv('{p}', "
            "columns={'a':'VARCHAR','b':'VARCHAR','c':'VARCHAR'}, "
            "header=true, auto_detect=false, delim=',', quote='\"')"
        ).fetchall()
        assert sorted(got, key=str) == [(2, "q", 2.0), (5, "w", None)]


class TestBadRecordsPathIsNotOSS:
    def test_oss_spark_silently_ignores_bad_records_path(
        self, spark, tmp_path
    ):
        body = "a,b,c\n1,x,2.5\n2,y\n"
        p = _write(tmp_path, "brp.csv", body)
        bad_dir = str(tmp_path / "bad_records")
        df = (
            spark.read.schema(SCHEMA)
            .option("header", True)
            .option("badRecordsPath", bad_dir)
            .csv(p)
        )
        rows = sorted(tuple(r) for r in df.collect())
        # the malformed row stays IN the output (PERMISSIVE padding)
        # and no quarantine dir is ever created — the option is a
        # Databricks-runtime feature, a silent no-op here
        assert rows == [(1, "x", 2.5), (2, "y", None)]
        assert not os.path.exists(bad_dir)


class TestCleanSubsetParity:
    def test_clean_subset_matches_duckdb_strict_read(self, spark, tmp_path):
        """The distilled oracle-authoring rule, demonstrated: on a
        dirty file, Spark's quarantine-clean frame equals DuckDB's
        strict (store_rejects) kept rows — the only stable contract.
        (Long rows, unclosed quotes, and type failures must NOT be in
        the clean set on either side.)"""
        body = (
            "a,b,c\n"
            "1,x,2.5\n"
            "2,y\n"              # short → quarantined / rejected
            "3,z,4.5,EXTRA\n"    # long → quarantined / rejected
            "5,w,notanumber\n"   # type → quarantined / rejected
            "6,ok,7.5\n"
        )
        p = _write(tmp_path, "dirty.csv", body)
        clean, quar = _spark_rows(spark, p)
        assert clean == [(1, "x", 2.5), (6, "ok", 7.5)]
        assert len(quar) == 3
        con = duckdb.connect()
        kept = con.execute(
            f"SELECT * FROM read_csv('{p}', {DUCK_OPTS}, store_rejects=true)"
        ).fetchall()
        assert sorted(kept) == clean
        n_rejects = con.execute(
            "SELECT COUNT(*) FROM reject_errors"
        ).fetchone()[0]
        assert n_rejects == 3


class TestCorruptOnlyPruning:
    """r16 ADVICE close: queries pruned to ONLY the corrupt column.

    Spark refuses raw-CSV scans whose required schema is just the
    internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the
    quarantine contract's own operation, row COUNTS per error class,
    prunes to exactly that. read_with_quarantine caches the parsed
    frame before the split so both halves rebase on an
    InMemoryRelation, which the restriction does not apply to."""

    BODY = "a,b,c\n1,x,2.5\n2,y\n3,z,4.5\n"

    def test_counts_on_both_halves(self, spark, tmp_path):
        p = _write(tmp_path, "prune.csv", self.BODY)
        clean, quar = read_with_quarantine(spark, p, SCHEMA)
        # Both of these threw AnalysisException before the cache.
        assert clean.count() == 2
        assert quar.count() == 1
        spark.catalog.clearCache()

    def test_corrupt_only_projection(self, spark, tmp_path):
        p = _write(tmp_path, "prune2.csv", self.BODY)
        clean, quar = read_with_quarantine(spark, p, SCHEMA)
        raw = [r[0] for r in quar.select(CORRUPT_COL).collect()]
        assert raw == ["2,y"]
        spark.catalog.clearCache()
