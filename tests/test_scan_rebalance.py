"""Adaptive input-rebalance probe (catalog._rebalance_partitions, r16
optimization round): an opt-in, metadata-only repartition for heavy
map pipelines over physically unsplittable parquet (single-row-group
files scan as ONE non-empty task regardless of split count)."""

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import (
    _rebalance_partitions,
    load_table,
)

SF_DIR = "/root/testdata/sf0.01"
DOCS = os.path.join(SF_DIR, "documents.parquet")
LINEITEM = os.path.join(SF_DIR, "lineitem.parquet")
NATION = os.path.join(SF_DIR, "nation.parquet")


def test_probe_fires_on_big_single_rowgroup_file():
    # lineitem at sf0.01 is ~1 MB in one row group: cannot fill 8 cores
    assert _rebalance_partitions(LINEITEM, 8) == 8


def test_probe_skips_tiny_dimension():
    # nation is a few KB — below the min-bytes floor, a shuffle would
    # cost more than the serial scan
    assert _rebalance_partitions(NATION, 8) is None


def test_probe_skips_when_one_unit_fills_one_core():
    # cores=1: a single row group IS full parallelism
    assert _rebalance_partitions(LINEITEM, 1) is None


def test_probe_disabled_by_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_REBALANCE_MIN_BYTES", "-1")
    assert _rebalance_partitions(LINEITEM, 8) is None


def test_probe_missing_path_is_noop():
    assert _rebalance_partitions("/nonexistent/x.parquet", 8) is None


@pytest.mark.usefixtures("spark")
def test_load_table_opt_in_spreads_rows_and_keeps_values(spark):
    base = load_table(spark, SF_DIR, "lineitem")
    reb = load_table(spark, SF_DIR, "lineitem", scan_parallel_key="l_orderkey")
    cores = spark.sparkContext.defaultParallelism
    n_nonempty = (
        reb.groupBy(F.spark_partition_id().alias("pid")).count().count()
    )
    if cores > 1:
        assert n_nonempty > 1, (
            "opt-in rebalance should spread a single-row-group scan "
            f"across cores (got {n_nonempty} non-empty partitions)"
        )
    # value identity: same rows either way
    assert base.count() == reb.count()
    # bit_xor, not sum: summing 600k hashes overflows long under ANSI
    a = base.agg(F.bit_xor(F.xxhash64(*sorted(base.columns)))).collect()[0][0]
    b = reb.agg(F.bit_xor(F.xxhash64(*sorted(reb.columns)))).collect()[0][0]
    assert a == b


@pytest.mark.usefixtures("spark")
def test_load_table_default_is_unchanged(spark):
    # no opt-in -> no Repartition node in the plan
    df = load_table(spark, SF_DIR, "documents")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" not in plan
