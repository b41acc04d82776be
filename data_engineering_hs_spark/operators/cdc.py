"""Change-data-capture primitives: snapshot diff, changeset apply
(MERGE), and SCD Type-2 history build.

The reference stack delegates these to dbt snapshots and warehouse
MERGE statements (lab05-airflow/dags/fuel_ingest_dag.py upsert path,
lab04-dbt incremental models); here they are first-class DataFrame
operators so the same semantics run on any Spark-readable store.

Scale shape: every operator is a single hash-shuffle on the business
key — `snapshot_diff` one full-outer join, `apply_changeset` one
anti-join + union, `scd2_history` one window partitioned by key.
Nothing collects to the driver and no operator is quadratic, so all
three survive a 1000-executor 100-TB run as long as the key space
itself is not pathologically skewed (for that, see operators.scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_COL = "op"


def _qcol(alias: str, c: str):
    """Alias-qualified column ref with the column segment backtick-
    quoted: a raw f-string (`F.col(f"o.{c}")`) would mis-parse a
    column name containing a dot as a nested-field path — these are
    generic library entry points, so arbitrary names are in scope.
    Literal backticks inside the name escape by doubling, per Spark's
    quoted-identifier rules."""
    return F.col(f"{alias}.`" + c.replace("`", "``") + "`")


def _bq(c: str):
    """Unaliased backtick-quoted column ref (same dot-safety as
    _qcol, for single-frame selects)."""
    return F.col("`" + c.replace("`", "``") + "`")


def _neq_any(left_alias: str, right_alias: str, cols: Sequence[str]):
    """True when any compare column differs (null-safe).

    Takes alias NAMES, not DataFrames: when both sides derive from the
    same cached table their DataFrame-indexed columns carry identical
    expression IDs and the join trips failAmbiguousSelfJoin. String-
    qualified columns (`F.col("o.c")`) resolve against the aliases
    instead, which is safe on both sides of a self-join.
    """
    cond = F.lit(False)
    for c in cols:
        cond = cond | ~_qcol(left_alias, c).eqNullSafe(_qcol(right_alias, c))
    return cond


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Derive a changeset between two snapshots of the same table.

    Returns `keys + compare_cols + op` where op ∈ {insert, update,
    delete}: rows only in `new` are inserts, rows only in `old` are
    deletes, rows in both with any differing compare column (null-safe)
    are updates. Unchanged rows are dropped. Non-key columns carry the
    NEW values (NULL for deletes), so the changeset alone is enough to
    replay the transition with `apply_changeset`.

    One full-outer shuffle join on the keys; comparisons are null-safe
    Column algebra, so the whole diff stays inside codegen.

    Columns are referenced by string-qualified alias (`F.col("o.k")`)
    rather than DataFrame indexing: when `old` and `new` both derive
    from one cached table (the driver harness caches every source
    table), DataFrame-indexed columns share expression IDs across the
    two sides and Spark's failAmbiguousSelfJoin check rejects the
    plan. Qualified names resolve against the join-side aliases, so
    the same code handles genuine snapshots and self-join-style diffs.
    """
    compare_cols = list(compare_cols or [c for c in new.columns if c not in keys])
    o = old.alias("o")
    n = new.alias("n")
    cond = [_qcol("o", k).eqNullSafe(_qcol("n", k)) for k in keys]
    j = o.join(n, cond, "full_outer")
    # presence detection must not rely on nullable data columns: use a
    # key column (keys are non-null by contract in both snapshots)
    k0 = keys[0]
    new_present = _qcol("n", k0).isNotNull()
    old_present = _qcol("o", k0).isNotNull()
    op = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(_neq_any("o", "n", compare_cols), F.lit("update"))
        .otherwise(F.lit(None))
    )
    out_keys = [
        F.coalesce(_qcol("n", k), _qcol("o", k)).alias(k) for k in keys
    ]
    out_vals = [_qcol("n", c).alias(c) for c in compare_cols]
    return (
        j.select(*out_keys, *out_vals, op.alias(OP_COL))
        .filter(F.col(OP_COL).isNotNull())
    )


def apply_changeset(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """MERGE a `snapshot_diff`-shaped changeset into a base table.

    Semantics: delete removes the keyed row, update replaces it,
    insert adds it — i.e. `apply_changeset(old, snapshot_diff(old,
    new, keys), keys)` reproduces `new` exactly (round-trip asserted
    in tests and by the c_apply_changeset oracle).

    Plan: one left-anti join (drop all touched keys from base) + a
    union with the insert/update payload. The anti join broadcasts
    when the changeset is small — the common CDC case where a day's
    changes meet a years-deep base table.
    """
    touched = changes.select(*[_bq(k).alias(k) for k in keys]).distinct()
    kept = base.join(touched, list(keys), "left_anti")
    upserts = changes.filter(_bq(op_col) != "delete").drop(op_col)
    return kept.unionByName(
        upserts.select(*[_bq(c).alias(c) for c in base.columns])
    )


def scd2_history(
    df: DataFrame,
    key: str,
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension Type 2 from an event/order stream.

    Collapses consecutive rows per key with identical tracked
    attributes and emits one validity interval per attribute regime:
    `key, attr_cols…, valid_from, valid_to, version, is_current`
    (valid_to NULL on the open interval — dbt snapshot layout).

    Ordering inside a key is (ts, *tiebreak_cols) so same-timestamp
    rows resolve deterministically. Change detection is a null-safe
    lag comparison; interval close is a lead over the change rows —
    two window passes over ONE shuffle (both windows share the
    partition key, so Spark reuses the exchange). Column refs go
    through the module's backtick quoting (_bq), same dotted-name
    safety as snapshot_diff/apply_changeset.
    """
    order = [_bq(ts_col), *[_bq(c) for c in tiebreak_cols]]
    w = Window.partitionBy(_bq(key)).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~_bq(c).eqNullSafe(F.lag(_bq(c)).over(w))
    first = F.row_number().over(w) == 1
    marked = df.withColumn("__chg", first | changed).filter("__chg")
    w2 = Window.partitionBy(_bq(key)).orderBy(*order)
    return (
        marked.select(
            _bq(key).alias(key),
            *[_bq(c).alias(c) for c in attr_cols],
            _bq(ts_col).alias("valid_from"),
            F.lead(_bq(ts_col)).over(w2).alias("valid_to"),
            F.row_number().over(w2).alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
