"""Query registry.

Each query is a named (spark, sf_dir) -> DataFrame callable plus an
optional DuckDB-runnable ANSI-SQL oracle over the same parquet tables
(driver contract, __spark_entry__.py). Registration is declarative so
__spark_entry__, bench.py, and tests all consume one source of truth.

Determinism conventions (engine-wide, see functions.scalar.money_cents):
- monetary 2-dp doubles aggregate via exact BIGINT cents, then one
  double division at the end → bit-identical across engines;
- every computed column is aliased identically in Spark and SQL;
- raw event timestamps are never emitted (ns vs us precision).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def stable_round_sql(expr: str, n: int) -> str:
    """DuckDB twin of functions.scalar.stable_round — the
    engine-stable round of a computed double ratio/score (see that
    docstring for the full rationale; r14 decimal lens,
    tests/test_fuzz_decimal.py). Emits the STRING-route form so
    oracle ROUNDs agree with the engine's on every shortest-repr tie
    and never produce -0.0. The CASE guard mirrors the Column twin's
    totality contract: NaN/Inf/|x| >= 1e18 pass through unchanged
    (rounding is the identity above 2^53) instead of throwing in the
    decimal cast; NaN < 1e18 is false in DuckDB, so NaN takes the
    ELSE branch like Spark's."""
    route = (
        "CAST(CAST(round(CAST(CAST(("
        + expr
        + f") AS VARCHAR) AS DECIMAL(38,18)), {n}) AS VARCHAR) AS DOUBLE)"
    )
    return (
        f"CASE WHEN abs(({expr})) < 1e18 THEN {route} ELSE ({expr}) END"
    )


def register(name: str, oracle: str | None = None, doc: str = "", bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco
