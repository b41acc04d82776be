"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle on DuckDB over the
same parquet dir, then compares row count, column names, and
order-insensitive values. Strict by default (exact equality after
canonicalization) so any cross-engine drift surfaces here before
the driver sees it.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def _canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, (dt.datetime,)):
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon_cell(x) for x in v))
    if isinstance(v, (bool,)):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _canon_df(pdf):
    import numpy as np
    import pandas as pd

    cols = sorted(pdf.columns)
    rows = []
    for _, row in pdf[cols].iterrows():
        cells = []
        for c in cols:
            v = row[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append(("null",))
                continue
            if isinstance(v, np.ndarray):
                v = v.tolist()
            if isinstance(v, (np.integer,)):
                v = int(v)
            elif isinstance(v, (np.floating,)):
                v = float(v)
            elif isinstance(v, (np.bool_,)):
                v = bool(v)
            elif isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            cells.append(_canon_cell(v))
        rows.append(tuple(cells))
    return cols, sorted(rows)


# Queries where an empty result would be a finding in itself; for
# everything else a 0-row "match" is vacuous (it only proves both
# engines found nothing) and the harness flags it.
EMPTINESS_OK: frozenset[str] = frozenset()


def compare_query(spark, name: str, sf_dir: str) -> list[str]:
    """Returns a list of problems (empty = match)."""
    from data_engineering_hs_spark.queries import REGISTRY

    q = REGISTRY[name]
    problems: list[str] = []
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if len(spark_pdf) == 0 and name not in EMPTINESS_OK:
        problems.append("vacuous: query returns 0 rows")
    if q.oracle is None:
        if len(spark_pdf.columns) == 0:
            problems.append("no columns")
        return problems
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, s_rows = _canon_df(spark_pdf)
    o_cols, o_rows = _canon_df(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if s_rows != o_rows:
        n_bad = 0
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            if sr != orow:
                n_bad += 1
                if n_bad <= 3:
                    for c, sv, ov in zip(s_cols, sr, orow):
                        if sv != ov:
                            problems.append(
                                f"row {i} col {c}: spark={sv!r} oracle={ov!r}"
                            )
        if n_bad:
            problems.append(f"{n_bad} mismatching rows (of {len(s_rows)})")
    return problems
