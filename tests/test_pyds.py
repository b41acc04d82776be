"""Custom Python DataSource (docs_gen): schema, determinism across
partition counts, and pushFilters partition pruning."""

from __future__ import annotations

import pytest

from data_engineering_hs_spark.sources import pyds


@pytest.fixture()
def registered(spark):
    pyds.register(spark)
    return spark


class TestDocsGen:
    def test_read_and_schema(self, registered):
        df = (
            registered.read.format("docs_gen")
            .option("n_docs", 100)
            .option("seed", 7)
            .load()
        )
        assert df.columns == ["doc_id", "text", "n_tokens"]
        assert df.count() == 100
        rows = df.filter("doc_id = 3").collect()
        assert len(rows) == 1 and rows[0].n_tokens == len(rows[0].text.split())

    def test_deterministic_across_partitioning(self, registered):
        def rows(parts):
            return sorted(
                map(
                    tuple,
                    registered.read.format("docs_gen")
                    .option("n_docs", 64)
                    .option("partitions", parts)
                    .load()
                    .collect(),
                )
            )

        assert rows(2) == rows(11)

    def test_filter_pushdown_correct_results(self, registered):
        df = (
            registered.read.format("docs_gen")
            .option("n_docs", 1000)
            .load()
            .filter("doc_id >= 990 and doc_id < 995")
        )
        assert sorted(r.doc_id for r in df.collect()) == [990, 991, 992, 993, 994]

    def test_pushdown_narrows_partition_planning(self):
        from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

        r = pyds.DocsGenReader(None, {"n_docs": "1000", "partitions": "8"})
        unsupported = list(
            r.pushFilters(
                [GreaterThanOrEqual(("doc_id",), 900), LessThan(("doc_id",), 950)]
            )
        )
        assert unsupported == []  # both accepted
        parts = r.partitions()
        covered = sorted((p.lo, p.hi) for p in parts)
        assert covered[0][0] == 900 and covered[-1][1] == 950
        # 50 ids over 8 requested slices — fully pruned outside range
        assert sum(hi - lo for lo, hi in covered) == 50

    def test_unsupported_filter_is_returned(self):
        from pyspark.sql.datasource import EqualTo

        r = pyds.DocsGenReader(None, {"n_docs": "10"})
        leftover = list(r.pushFilters([EqualTo(("text",), "x")]))
        assert len(leftover) == 1
