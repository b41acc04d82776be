"""As-of (temporal) join — an operator Spark lacks natively.

For each left row, attach the most recent right row (per key) whose
timestamp is <= the left row's timestamp. Two implementations:

- asof_join: composition of built-ins (the scale path). Union-tag the
  two sides, sort within key partitions, and carry the last-seen right
  row forward with last(..., ignorenulls) over an unbounded-preceding
  window. ONE shuffle on the key, no range-explosion join, no Python.
  This is the classic "sort-merge as-of" expressed declaratively.
- asof_join_pandas: applyInPandas + pandas.merge_asof per key group —
  the fallback shape for semantics the window form can't express
  (nearest/forward direction with tolerance), at Arrow-batch cost.

Tie semantics: right rows with ts equal to the left ts DO match
(inclusive, merge_asof default). Ordering among equal timestamps is
broken by the right id column for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    ts_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join via union + window carry-forward.

    Returns all left columns plus `value_cols` from the matched right
    row (null when no right row precedes). `on` is the equi-key;
    timestamps compared on their native type (caller aligns units).

    The matched right row is carried as ONE struct, not per-column:
    a per-column last(ignorenulls) would back-fill a genuinely-NULL
    right field from an OLDER right row, returning a frankenrow that
    never existed (merge_asof returns the whole matched row,
    NULL fields included). The struct itself is non-null for every
    right row, so ignorenulls only skips the left-side tags.

    `ts_tiebreak` names any right column (not necessarily in
    value_cols) that orders equal-timestamp right rows; without it,
    which of several equal-ts right rows wins is engine-dependent.
    """
    lcols = left.columns
    rstruct_cols = list(value_cols)
    if ts_tiebreak and ts_tiebreak not in rstruct_cols:
        rstruct_cols.append(ts_tiebreak)
    # A NULL-ts right row can never be "the most recent row <= ts" —
    # but ascending sort puts NULLs FIRST, so without this filter it
    # sat at the window's start and matched every left row that had no
    # real predecessor (found live: window form returned the null-ts
    # row where merge_asof returns no match). Null-ts LEFT rows need
    # no special case: they sort before every right row and correctly
    # carry a null match.
    tagged_right = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in rstruct_cols]).alias("__r"),
    )
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            tagged_right.schema["__r"].dataType
        ).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if ts_tiebreak:
        order.insert(1, F.col(f"__r.{ts_tiebreak}").asc_nulls_last())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """merge_asof fallback: per-key pandas cogroup. Supports forward/
    nearest directions and tolerances the window form doesn't."""
    import pandas as pd

    from pyspark.sql import types as T

    fields = [left.schema[c] for c in left.columns] + [
        T.StructField(f"asof_{c}", right.schema[c].dataType) for c in value_cols
    ]
    schema = T.StructType(fields)
    # plain bools for the worker closure — capturing the DataFrames
    # themselves would pickle a SparkContext reference (SPARK-5063)
    left_ts_integral = isinstance(
        left.schema[left_ts].dataType, T.IntegralType
    )
    right_ts_integral = isinstance(
        right.schema[right_ts].dataType, T.IntegralType
    )

    def merge(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        # merge_asof RAISES on null merge keys; the window form
        # tolerates them — match that: null-ts left rows pass through
        # with null asof columns, null-ts right rows can never match
        null_left = ldf[ldf[left_ts].isna()].copy()
        ldf = ldf[ldf[left_ts].notna()].sort_values(left_ts)
        rdf = rdf[rdf[right_ts].notna()].sort_values(right_ts)[
            [right_ts, *value_cols]
        ].rename(columns={c: f"asof_{c}" for c in value_cols})
        # merge_asof REFUSES mismatched key dtypes, and an integral ts
        # column that carried nulls arrives float64 (Arrow) while the
        # other side stays int — a single null ts on one side crashed
        # the whole join with MergeError. The NaNs are filtered above,
        # so when the DECLARED Spark type is integral the float column
        # holds only exact integral values: cast it back. Gated on the
        # Spark schema, not the pandas dtype, so a genuinely-double ts
        # is never truncated.
        for pdf_, col_, integral in (
            (ldf, left_ts, left_ts_integral),
            (rdf, right_ts, right_ts_integral),
        ):
            if integral:
                # also normalizes int32-vs-int64 width mismatches
                pdf_[col_] = pdf_[col_].astype("int64")
        # Integral value columns ride the merge as OBJECT dtype: the
        # left join puts NaN on unmatched rows, which would coerce an
        # int64 column to float64 and silently ROUND matched values
        # above 2^53 (2^60+1 came back as 2^60 before this). Object
        # columns carry exact Python ints; Arrow turns the NaNs into
        # nulls. (A right column that itself holds nulls already
        # arrives float64 from the Arrow boundary — that conversion is
        # upstream of this function.)
        for c in value_cols:
            ac = f"asof_{c}"
            if pd.api.types.is_integer_dtype(rdf[ac]):
                rdf[ac] = rdf[ac].astype(object)
        merged = pd.merge_asof(
            ldf,
            rdf,
            left_on=left_ts,
            right_on=right_ts,
            direction=direction,
            tolerance=tolerance,
        )
        keep = list(ldf.columns) + [f"asof_{c}" for c in value_cols]
        if len(null_left):
            for c in value_cols:
                null_left[f"asof_{c}"] = None
            merged = pd.concat([merged[keep], null_left[keep]])
        return merged[keep]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=schema)
    )
