"""Assertion operators — the engine's `dbt test` (SURVEY.md §2.11).

Reference: magic_shop/models/schema.yml:6-28 declares not_null,
unique, and accepted_values tests; lab05's DDL enforces PK/NOT NULL
at the sink (001_create_table.sql:2-3). Here each check is (a) a
violation-count DataFrame for reporting and (b) an `expect_*`
raising form for pipeline gating, wired into plans.model_dag like
dbt wiring tests to models.

All checks are single-pass aggregations — at 100 TB each is one scan
(no collect of row-level violations unless explicitly sampled).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AssertionError_(AssertionError):
    """Raised when a data-quality expectation fails."""


def _as_report(check_name: str, violations) -> DataFrame:
    return violations.select(
        F.lit(check_name).alias("check_name"),
        F.col("violations").cast("long").alias("violations"),
    )


def not_null_violations(df: DataFrame, col: str, table: str = "t") -> DataFrame:
    """Count of NULLs in `col` (dbt not_null)."""
    agg = df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).alias("violations")
    )
    return _as_report(f"{table}.{col}.not_null", agg)


def unique_violations(df: DataFrame, col: str, table: str = "t") -> DataFrame:
    """Count of surplus duplicate rows on `col` (dbt unique): sum(n-1)
    over groups with n>1, so a clean column reports 0.

    NULL keys are ignored, matching dbt's `unique` test — nullness is
    not_null's job, and two NULLs are not equal to each other.
    """
    dups = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("violations"))
    )
    return _as_report(f"{table}.{col}.unique", dups)


def accepted_values_violations(
    df: DataFrame, col: str, values: Sequence[str], table: str = "t"
) -> DataFrame:
    """Count of rows outside the accepted set (dbt accepted_values)."""
    agg = df.agg(
        F.count(F.when(~F.col(col).isin(list(values)), 1)).alias("violations")
    )
    return _as_report(f"{table}.{col}.accepted_values", agg)


def _gate(report: DataFrame) -> None:
    row = report.collect()[0]
    if row["violations"] != 0:
        raise AssertionError_(f"{row['check_name']}: {row['violations']} violations")


def expect_not_null(df: DataFrame, col: str, table: str = "t") -> None:
    _gate(not_null_violations(df, col, table))


def expect_unique(df: DataFrame, col: str, table: str = "t") -> None:
    _gate(unique_violations(df, col, table))


def expect_accepted_values(
    df: DataFrame, col: str, values: Sequence[str], table: str = "t"
) -> None:
    _gate(accepted_values_violations(df, col, values, table))


def split_by_rules(
    df: DataFrame, rules: Sequence[tuple[str, str]]
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: (valid, quarantined-with-reasons).

    `rules` are (name, SQL boolean expression that is TRUE for GOOD
    rows). Row-level DQ as a single projection — every rule evaluates
    once per row, the reasons array collects every failed rule name
    (not just the first), valid rows are those with zero failures.
    The streaming/batch twin of the source-level corrupt-record
    quarantine (sources/json.py): that one catches unparseable rows,
    this one catches parseable-but-invalid rows. Both frames derive
    from one plan, so writing both sides costs one scan with cached
    input (or two scans uncached — still no shuffle).

    NULL rule results FAIL: a rule like `value >= 0` evaluates to
    NULL when value is NULL, and three-valued logic would silently
    pass that row through a naive NOT-filter. DQ semantics here are
    "unknown is not valid" — each rule is coalesced to FALSE before
    negation, so a NULL verdict quarantines with the rule's name."""
    reasons = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(expr), F.lit(False)), F.lit(name)
                ).otherwise(F.lit(None).cast("string"))
                for name, expr in rules
            ]
        )
    )
    tagged = df.withColumn("__dq_reasons", reasons)
    valid = tagged.filter(F.size("__dq_reasons") == 0).drop("__dq_reasons")
    quarantined = tagged.filter(F.size("__dq_reasons") > 0).withColumnRenamed(
        "__dq_reasons", "dq_reasons"
    )
    return valid, quarantined
