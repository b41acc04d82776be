"""Unit tests for operators.cdc: null-safe diff semantics, MERGE
round-trip, SCD2 interval collapse. The registry-level queries
(c_snapshot_diff / c_apply_changeset / c_scd2_priority) are oracle
-checked in test_oracle_parity; these pin the operator edge cases
oracles can't isolate."""

from __future__ import annotations

import datetime as dt

from data_engineering_hs_spark.operators import cdc


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_diff_kinds_and_null_safety(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "C"), (5, "e")], "k int, v string"
    )
    diff = cdc.snapshot_diff(old, new, keys=["k"])
    got = {(r.k): (r.v, r.op) for r in diff.collect()}
    # k=1 unchanged, k=2 null==null → unchanged, k=3 update,
    # k=4 delete (null payload), k=5 insert
    assert got == {3: ("C", "update"), 4: (None, "delete"), 5: ("e", "insert")}


def test_snapshot_diff_null_to_value_is_update(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "x")], "k int, v string")
    assert [r.op for r in cdc.snapshot_diff(old, new, ["k"]).collect()] == ["update"]


def test_apply_changeset_round_trip(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b2"), (3, None), (6, "f")], "k int, v string"
    )
    diff = cdc.snapshot_diff(old, new, keys=["k"])
    merged = cdc.apply_changeset(old, diff, keys=["k"])
    assert _rows(merged) == _rows(new)


def test_scd2_collapses_consecutive_and_chains_intervals(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "A", t0),
        (1, "A", t0 + dt.timedelta(days=1)),
        (1, "B", t0 + dt.timedelta(days=2)),
        (1, "A", t0 + dt.timedelta(days=3)),
        (2, "X", t0),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp")
    hist = cdc.scd2_history(df, key="k", attr_cols=["attr"], ts_col="ts")
    h1 = sorted(
        ((r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
         for r in hist.filter("k = 1").collect()),
        key=lambda x: x[3],
    )
    assert [x[0] for x in h1] == ["A", "B", "A"]
    assert [x[3] for x in h1] == [1, 2, 3]
    # intervals chain: each valid_to equals the next valid_from
    assert h1[0][2] == h1[1][1] and h1[1][2] == h1[2][1]
    assert [x[4] for x in h1] == [False, False, True]
    h2 = hist.filter("k = 2").collect()
    assert len(h2) == 1 and h2[0].is_current and h2[0].valid_to is None


def test_scd2_tiebreak_orders_same_timestamp_rows(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, "B", t0, 2), (1, "A", t0, 1)]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, seq int")
    hist = cdc.scd2_history(
        df, key="k", attr_cols=["attr"], ts_col="ts", tiebreak_cols=["seq"]
    )
    got = sorted((r.version, r.attr) for r in hist.collect())
    assert got == [(1, "A"), (2, "B")]


def test_snapshot_diff_handles_dotted_column_names(spark):
    """Column names containing dots must resolve as FLAT columns, not
    nested-field paths — qualified refs are built with backtick-quoted
    segments (r8, ADVICE fix)."""
    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["the.key", "attr.v1"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], ["the.key", "attr.v1"]
    )
    out = {
        (r["the.key"], r["attr.v1"], r["op"])
        for r in cdc.snapshot_diff(old, new, keys=["the.key"]).collect()
    }
    assert out == {(2, "B", "update"), (3, "c", "insert")}
    merged = cdc.apply_changeset(
        old, cdc.snapshot_diff(old, new, keys=["the.key"]), keys=["the.key"]
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in new.collect()
    }


class TestDottedNames:
    def test_scd2_and_apply_changeset_with_dotted_columns(self, spark):
        from data_engineering_hs_spark.operators.cdc import (
            apply_changeset,
            scd2_history,
        )

        df = spark.createDataFrame(
            [(1, "a", 10), (1, "a", 20), (1, "b", 30)],
            ["user.id", "profile.tier", "event.ts"],
        )
        hist = scd2_history(
            df, key="user.id", attr_cols=["profile.tier"],
            ts_col="event.ts",
        ).collect()
        assert len(hist) == 2
        assert [r["version"] for r in sorted(hist, key=lambda r: r["valid_from"])] == [1, 2]

        base = spark.createDataFrame([(1, "x")], ["the.key", "v"])
        changes = spark.createDataFrame(
            [(2, "y", "insert")], ["the.key", "v", "cdc.op"]
        )
        out = apply_changeset(base, changes, keys=["the.key"], op_col="cdc.op")
        assert sorted(r["v"] for r in out.collect()) == ["x", "y"]
