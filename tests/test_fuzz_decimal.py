"""Decimal/rounding parity lens (r14, queued item executed early):
Spark vs DuckDB vs Python-decimal on precision boundaries, rounding
ties, casts, and ANSI overflow.

FINDINGS (pinned below as living tests):
- DECIMAL round is HALF-UP-away-from-zero and IDENTICAL in all three
  engines (fuzzed) — decimal space is the safe rounding domain.
- round(DOUBLE, n) at ties DIVERGES between engines and is not even
  self-consistent within DuckDB: Spark rounds the double's SHORTEST
  DECIMAL REPR half-up (1.005 → 1.01, 0.285 → 0.29 — BigDecimal
  .valueOf semantics), DuckDB rounds value-dependently (1.005 → 1.00
  but 2.675 → 2.68). Every `round(x, n)` restated on both sides of
  an oracle is therefore a latent hash mismatch whenever a computed
  double's shortest repr has exactly n+1 fractional digits ending in
  5. No current row manifests it (all 186 hash-green), but the class
  is real. Direct double→DECIMAL cast is NOT a fix: DuckDB converts
  via value·10^scale float arithmetic, so its result is
  SCALE-DEPENDENT (1.005e0 → 1.0050000000 at scale 10 but
  1.004999999999999890 at scale 18 — diverging from Spark's
  shortest-repr BigDecimal cast; demonstrated below). The principled
  cross-engine form routes through the STRING cast — both engines
  print doubles as the shortest round-trip repr (incl. E-notation)
  and parse it exactly into decimal, where rounding agrees:
  `round(CAST(CAST(x AS STRING) AS DECIMAL(38,18)), n)` (caveat:
  |x| must fit 20 integer digits under ANSI). Pinned below;
  converting existing round sites is proposed for round-15 sanction
  (NEXT.md).
- CAST(decimal AS BIGINT): Spark truncates toward zero, DuckDB
  rounds half-away (2.5 → 2 vs 3). Known repo rule (floor() // both
  sides); now pinned so a silent engine change screams.
- ANSI decimal overflow is LOUD in both engines (cast out of range,
  multiply overflow, sum overflow all raise; try_sum gives NULL) —
  a 100-TB job dies rather than corrupts.
- Decimal `*` RESULT-TYPE rules differ (found by this fuzz): Spark
  widens the product to DECIMAL(p1+p2+1, s1+s2) capped at 38; DuckDB
  keeps the MAX OPERAND WIDTH, so DECIMAL(18,4) * DECIMAL(18,4)
  overflows in DuckDB for products Spark computes fine (its error
  says 'add an explicit cast to a bigger decimal'). Oracle rule: any
  decimal multiplication restated in DuckDB must pre-cast one
  operand to the full result width.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

FUZZ = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# decimal strings: up to 13 integer digits, scale up to 4, signed,
# biased toward .5 ties via the last-digit alphabet
dec_strings = st.builds(
    lambda sign, ip, fp: f"{sign}{ip}.{fp}",
    st.sampled_from(["", "-"]),
    st.integers(min_value=0, max_value=9_999_999_999_999).map(str),
    st.sampled_from(["5", "05", "005", "15", "25", "995", "4999", "5001", "0"]),
)


@given(vals=st.lists(dec_strings, min_size=1, max_size=8), n=st.sampled_from([0, 1, 2]))
@FUZZ
def test_fuzz_decimal_round_three_way(spark, vals, n):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["r"]
        for r in df.select(
            "s",
            F.round(F.col("s").cast("decimal(20,4)"), n)
            .cast("string")
            .alias("r"),
        ).collect()
    }
    con = duckdb.connect()
    q = Decimal(1).scaleb(-n)
    for v in vals:
        duck = con.execute(
            f"SELECT CAST(round(CAST('{v}' AS DECIMAL(20,4)), {n}) AS VARCHAR)"
        ).fetchone()[0]
        py = Decimal(v).quantize(q, rounding=ROUND_HALF_UP)
        assert Decimal(got[v]) == Decimal(duck) == py, (v, n, got[v], duck, py)


# operands for arithmetic: ≤5 integer digits so even the product
# (≤ 10+8 digits) fits DuckDB's max-operand-width product type —
# DuckDB does NOT widen decimal products the way Spark does (see
# module docstring); the width rule itself is this fuzz's finding
arith_strings = st.builds(
    lambda sign, ip, fp: f"{sign}{ip}.{fp}",
    st.sampled_from(["", "-"]),
    st.integers(min_value=0, max_value=99_999).map(str),
    st.sampled_from(["5", "05", "005", "15", "25", "995", "4999", "5001", "0"]),
)


@given(
    a=arith_strings,
    b=arith_strings,
    op=st.sampled_from(["+", "-", "*"]),
)
@FUZZ
def test_fuzz_decimal_arithmetic_exact_vs_python(spark, a, b, op):
    # operands bounded so no overflow is possible in either engine —
    # all three results must be EXACT
    df = spark.createDataFrame([(a, b)], "a string, b string")
    expr = f"CAST(CAST(a AS DECIMAL(18,4)) {op} CAST(b AS DECIMAL(18,4)) AS STRING)"
    got = Decimal(df.selectExpr(expr).collect()[0][0])
    duck = Decimal(
        duckdb.connect()
        .execute(
            f"SELECT CAST(CAST('{a}' AS DECIMAL(18,4)) {op} "
            f"CAST('{b}' AS DECIMAL(18,4)) AS VARCHAR)"
        )
        .fetchone()[0]
    )
    py = {
        "+": Decimal(a) + Decimal(b),
        "-": Decimal(a) - Decimal(b),
        "*": Decimal(a) * Decimal(b),
    }[op]
    assert got == duck == py, (a, b, op, got, duck, py)


class TestPinnedDivergences:
    """Living pins: each engine's EXACT behavior on the divergent
    surfaces, so a silent engine-version change screams here instead
    of flaking a driver hash row."""

    def test_cast_decimal_to_bigint_spark_truncates_duckdb_rounds(
        self, spark
    ):
        df = spark.createDataFrame(
            [("2.5",), ("-2.5",), ("2.4999",), ("9999999999.995",)],
            "s string",
        )
        got = {
            r["s"]: r["c"]
            for r in df.select(
                "s", F.col("s").cast("decimal(14,4)").cast("long").alias("c")
            ).collect()
        }
        # Spark: truncation toward zero
        assert got == {
            "2.5": 2,
            "-2.5": -2,
            "2.4999": 2,
            "9999999999.995": 9999999999,
        }
        con = duckdb.connect()
        duck = {
            v: con.execute(
                f"SELECT CAST(CAST('{v}' AS DECIMAL(14,4)) AS BIGINT)"
            ).fetchone()[0]
            for v in got
        }
        # DuckDB: round half away from zero — hence the repo rule:
        # never CAST a fractional value straight to BIGINT in an
        # oracle; floor()/`//` on BOTH sides.
        assert duck == {
            "2.5": 3,
            "-2.5": -3,
            "2.4999": 2,
            "9999999999.995": 10000000000,
        }

    def test_round_double_ties_diverge_between_engines(self, spark):
        # Spark = shortest-repr HALF_UP (BigDecimal.valueOf); DuckDB =
        # value-dependent. The three diverging values prove the rule:
        # round tie-capable doubles ONLY through the STRING route
        # (round(CAST(CAST(x AS STRING) AS DECIMAL(38,18)), n) —
        # shortest repr printed and exactly parsed in BOTH engines,
        # then identical decimal rounding; asserted at the bottom).
        vals = ["1.005", "-1.005", "0.285", "2.675", "0.125"]
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        got = {
            r["s"]: r["r"]
            for r in df.select(
                "s", F.round(F.col("s").cast("double"), 2).alias("r")
            ).collect()
        }
        assert got == {
            "1.005": 1.01,
            "-1.005": -1.01,
            "0.285": 0.29,
            "2.675": 2.68,
            "0.125": 0.13,
        }
        con = duckdb.connect()
        duck = {
            v: con.execute(
                f"SELECT round(CAST('{v}' AS DOUBLE), 2)"
            ).fetchone()[0]
            for v in vals
        }
        assert duck["1.005"] == 1.0 and duck["-1.005"] == -1.0
        assert duck["0.285"] == 0.28
        assert duck["2.675"] == 2.68 and duck["0.125"] == 0.13
        # direct double→decimal cast is NOT the fix: DuckDB converts
        # via value·10^scale float math, so the result depends on the
        # TARGET SCALE (agrees with Spark at scale 10, diverges at 18)
        duck_cast18 = con.execute(
            "SELECT CAST(CAST(CAST('1.005' AS DOUBLE) "
            "AS DECIMAL(38,18)) AS VARCHAR)"
        ).fetchone()[0]
        assert Decimal(duck_cast18) != Decimal("1.005"), duck_cast18
        # the engine-stable form: STRING-cast first (shortest repr in
        # both engines, incl. E-notation), parse to decimal, round
        for v in vals + ["9999999999.995", "0.0000001005"]:
            sp = spark.sql(
                "SELECT CAST(round(CAST(CAST(CAST("
                f"'{v}' AS DOUBLE) AS STRING) AS DECIMAL(38,18)), 2) "
                "AS STRING)"
            ).collect()[0][0]
            du = con.execute(
                "SELECT CAST(round(CAST(CAST(CAST("
                f"'{v}' AS DOUBLE) AS VARCHAR) AS DECIMAL(38,18)), 2) "
                "AS VARCHAR)"
            ).fetchone()[0]
            assert Decimal(sp) == Decimal(du), (v, sp, du)

    def test_round_signed_zero_divergence_and_normalization(self, spark):
        # DuckDB round() keeps the SIGN of a rounded-to-zero negative
        # (round(-0.0001, 2) = -0.0) while Spark's BigDecimal round
        # returns +0.0 — and both the local harness and the driver
        # canonicalize floats via repr(), which distinguishes '-0.0'
        # from '0.0'. Any oracle-restated round of a possibly-negative
        # double (growth rates, slopes, correlations, cosine
        # relevance) is one tiny-negative value away from a hash
        # flake. Normalization: `+ 0.0` after the DuckDB round
        # (-0.0 + 0.0 = +0.0; identity for every other value) —
        # applied to the w_mom_growth / a_group_regression /
        # s_mmr_diversify oracles in r14.
        sp = spark.sql(
            "SELECT round(CAST(-0.0001 AS DOUBLE), 2) AS r"
        ).collect()[0]["r"]
        assert repr(sp) == "0.0"  # Spark strips the sign
        con = duckdb.connect()
        du = con.execute("SELECT round(-0.0001::DOUBLE, 2)").fetchone()[0]
        assert repr(du) == "-0.0"  # DuckDB keeps it
        normalized = con.execute(
            "SELECT round(-0.0001::DOUBLE, 2) + 0.0"
        ).fetchone()[0]
        assert repr(normalized) == "0.0"

    def test_division_by_zero_and_try_family(self, spark):
        # ANSI Spark throws on x/0 EVEN FOR DOUBLES (no IEEE Inf);
        # DuckDB silently NULLs a double /0. Neither produces Inf —
        # so every engine-side division with a zero-capable
        # denominator needs its F.when(den != 0) guard (the repo
        # discipline) and every oracle its NULLIF. try_divide is the
        # sanctioned escape and agrees cross-engine. try_cast of a
        # NON-INTEGRAL string to INT diverges: Spark NULLs, DuckDB
        # parses-and-ROUNDS ('2.7' → 3) — never restate a Spark
        # try_cast(string AS INT) with DuckDB try_cast directly.
        from pyspark.errors import ArithmeticException

        with pytest.raises(ArithmeticException):
            spark.sql(
                "SELECT CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)"
            ).collect()
        con = duckdb.connect()
        assert con.execute("SELECT 1.0::DOUBLE / 0.0::DOUBLE").fetchone()[0] is None
        assert spark.sql("SELECT try_divide(1.0, 0.0)").collect()[0][0] is None
        assert spark.sql("SELECT try_cast('2.7' AS INT)").collect()[0][0] is None
        assert con.execute("SELECT try_cast('2.7' AS INT)").fetchone()[0] == 3

    def test_ansi_decimal_overflow_is_loud_not_null(self, spark):
        from pyspark.errors import ArithmeticException

        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
        with pytest.raises(ArithmeticException):
            spark.sql(
                "SELECT CAST('99999999999999' AS DECIMAL(12,2))"
            ).collect()
        with pytest.raises(ArithmeticException):
            spark.createDataFrame(
                [("9" * 38,)] * 3, "s string"
            ).select(F.sum(F.col("s").cast("decimal(38,0)"))).collect()
        # the sanctioned escape hatch returns NULL, not garbage
        row = spark.createDataFrame([("9" * 38,)] * 3, "s string").selectExpr(
            "try_sum(CAST(s AS DECIMAL(38,0))) AS t"
        ).collect()[0]
        assert row["t"] is None


# ---------------------------------------------------------------------------
# stable_round / stable_round_sql (r15): the sanctioned string-route
# helpers converted ~21 ratio-round sites. Three-way fuzz (Spark
# Column form vs DuckDB SQL twin vs Python Decimal HALF_UP on the
# shortest repr) + totality pins for the inputs a raw decimal cast
# would throw on (NaN/Inf/|x| >= 1e18).
# ---------------------------------------------------------------------------

tie_doubles = st.one_of(
    # shortest-repr tie class (d+1 fractional digits ending in 5)
    st.builds(
        lambda i, n: f"{i / 10**n:.{n}f}5",
        st.integers(min_value=-10**6, max_value=10**6),
        st.integers(min_value=0, max_value=5),
    ),
    # arbitrary finite doubles in ratio range
    st.floats(
        min_value=-1e15, max_value=1e15,
        allow_nan=False, allow_infinity=False,
    ).map(repr),
)


class TestStableRoundParity:
    @given(vals=st.lists(tie_doubles, min_size=1, max_size=6),
           n=st.sampled_from([0, 2, 4, 6, 8]))
    @FUZZ
    def test_three_way_parity(self, spark, vals, n):
        from data_engineering_hs_spark.functions.scalar import stable_round
        from data_engineering_hs_spark.queries.registry import (
            stable_round_sql,
        )

        df = spark.createDataFrame([(v,) for v in vals], "s string")
        got = {
            r["s"]: r["r"]
            for r in df.select(
                "s", stable_round(F.col("s").cast("double"), n).alias("r")
            ).collect()
        }
        con = duckdb.connect()
        for v in vals:
            du = con.execute(
                f"SELECT {stable_round_sql(f'CAST($v AS DOUBLE)', n)}",
                {"v": v},
            ).fetchone()[0]
            # Python third opinion: HALF_UP on the shortest repr of
            # the parsed double — the contract both engines implement.
            # + 0.0: decimals carry no signed zero through the route,
            # so -0.0 inputs emerge as +0.0 (the helper's documented
            # normalization); Python Decimal keeps the sign.
            py = (
                float(
                    Decimal(repr(float(v))).quantize(
                        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP
                    )
                )
                + 0.0
            )
            assert repr(got[v]) == repr(du) == repr(py), (v, n, got[v], du, py)

    def test_totality_nan_inf_huge_pass_through(self, spark):
        from data_engineering_hs_spark.functions.scalar import stable_round
        from data_engineering_hs_spark.queries.registry import (
            stable_round_sql,
        )

        df = spark.createDataFrame(
            [("nan",), ("inf",), ("-inf",), ("1e25",), ("-1e25",), (None,)],
            "s string",
        )
        rows = {
            r["s"]: r["r"]
            for r in df.select(
                "s", stable_round(F.col("s").cast("double"), 4).alias("r")
            ).collect()
        }
        import math

        assert math.isnan(rows["nan"])
        assert rows["inf"] == float("inf")
        assert rows["-inf"] == float("-inf")
        assert rows["1e25"] == 1e25 and rows["-1e25"] == -1e25
        assert rows[None] is None
        con = duckdb.connect()
        for v, want in [
            ("'NaN'", "nan"), ("'Infinity'", "inf"), ("1e25", "1e+25"),
        ]:
            du = con.execute(
                f"SELECT {stable_round_sql(f'CAST({v} AS DOUBLE)', 4)}"
            ).fetchone()[0]
            assert repr(du) == repr(float(want.strip("'"))) or str(du) == want
        du_null = con.execute(
            f"SELECT {stable_round_sql('CAST(NULL AS DOUBLE)', 4)}"
        ).fetchone()[0]
        assert du_null is None

    @given(vals=st.lists(tie_doubles, min_size=1, max_size=5),
           n=st.sampled_from([2, 4, 6]))
    @FUZZ
    def test_idempotent(self, spark, vals, n):
        # t_curate_training_set stable-rounds an already-stable-
        # rounded quality — the second application must be identity
        from data_engineering_hs_spark.functions.scalar import stable_round

        df = spark.createDataFrame([(v,) for v in vals], "s string")
        x = F.col("s").cast("double")
        rows = df.select(
            stable_round(x, n).alias("once"),
            stable_round(stable_round(x, n), n).alias("twice"),
        ).collect()
        for r in rows:
            assert repr(r["once"]) == repr(r["twice"])
