"""Calendar/interval parity pins (r14 lens, executed from the r15
candidate queue): Spark vs DuckDB on the month-arithmetic clamps,
ISO week edges, and day-of-week numbering every date-bucketing oracle
leans on.

Probe results (pinned here so an engine-version change screams):
- add_months / ±INTERVAL MONTH clamp identically (2024-01-31 +1mo →
  2024-02-29 in both; leap-day −12mo clamps the same way);
- last_day, date_trunc week/quarter, weekofyear (ISO), datediff all
  agree across year/leap boundaries;
- dayofweek DIVERGES BY CONVENTION: Spark 1=Sunday..7=Saturday,
  DuckDB 0=Sunday..6=Saturday — every oracle restatement must shift
  by one (the repo's single site does: scalars.py dow_sunday0).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

EDGE_DATES = [
    "2024-01-31",  # +1mo hits a leap February
    "2024-02-29",  # leap day itself
    "2023-02-28",  # non-leap end of February
    "2024-03-31",  # -1mo hits February
    "2020-02-29",  # leap day, +12mo clamps to the 28th
    "2021-01-03",  # ISO week 53 of the PREVIOUS year
    "2026-12-28",  # ISO week 53 start
    "2025-01-01",
]


def _spark_map(spark, expr):
    df = spark.createDataFrame(
        [(d,) for d in EDGE_DATES], "d string"
    ).selectExpr("CAST(d AS DATE) AS d")
    return {
        r["d"].isoformat(): str(r["v"])
        for r in df.selectExpr("d", f"CAST({expr} AS STRING) AS v").collect()
    }


def _duck_map(dexpr):
    con = duckdb.connect()
    out = {}
    for d in EDGE_DATES:
        q = "SELECT CAST(" + dexpr.replace("DATEX", f"DATE '{d}'") + " AS VARCHAR)"
        out[d] = str(con.execute(q).fetchone()[0])
    return out


def _dateify(m):
    # DuckDB renders date+interval as a timestamp; compare date parts
    return {k: v[:10] for k, v in m.items()}


class TestCalendarParity:
    def test_month_arithmetic_clamps_identically(self, spark):
        for sexpr, dexpr in [
            ("add_months(d, 1)", "DATEX + INTERVAL 1 MONTH"),
            ("add_months(d, -1)", "DATEX - INTERVAL 1 MONTH"),
            ("add_months(d, 12)", "DATEX + INTERVAL 12 MONTH"),
            ("last_day(d)", "last_day(DATEX)"),
        ]:
            assert _dateify(_spark_map(spark, sexpr)) == _dateify(
                _duck_map(dexpr)
            ), sexpr
        # the clamp the pins exist for
        got = _spark_map(spark, "add_months(d, 1)")
        assert got["2024-01-31"] == "2024-02-29"
        got12 = _spark_map(spark, "add_months(d, 12)")
        assert got12["2020-02-29"] == "2021-02-28"

    def test_week_and_quarter_edges_agree(self, spark):
        for sexpr, dexpr in [
            ("date_trunc('week', d)", "date_trunc('week', DATEX)"),
            ("date_trunc('quarter', d)", "date_trunc('quarter', DATEX)"),
            ("weekofyear(d)", "weekofyear(DATEX)"),
            ("datediff(d, DATE'2020-01-01')", "datediff('day', DATE '2020-01-01', DATEX)"),
        ]:
            assert _dateify(_spark_map(spark, sexpr)) == _dateify(
                _duck_map(dexpr)
            ), sexpr
        # ISO week edges both engines agree on (the reason weekofyear
        # oracles can restate 1:1): Jan 3 2021 is week 53 OF 2020
        assert _spark_map(spark, "weekofyear(d)")["2021-01-03"] == "53"
        assert _spark_map(spark, "weekofyear(d)")["2026-12-28"] == "53"

    def test_dayofweek_numbering_divergence_pinned(self, spark):
        # Spark: 1=Sunday..7=Saturday. DuckDB: 0=Sunday..6=Saturday.
        # Oracle rule: restate Spark dayofweek(d) as dayofweek(d)+1,
        # or emit Sunday-0 on both sides the way scalars.py does.
        sp = _spark_map(spark, "dayofweek(d)")
        du = _duck_map("dayofweek(DATEX)")
        for d in EDGE_DATES:
            assert int(sp[d]) == int(du[d]) + 1, (d, sp[d], du[d])
