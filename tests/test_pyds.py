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


class TestDocsGenStream:
    def test_stream_drains_and_resumes_exactly_once(self, registered, tmp_path):

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def run():
            q = (
                registered.readStream.format("docs_gen")
                .option("n_docs", 100)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        got = registered.read.parquet(out)
        assert got.count() == 100
        assert got.select("doc_id").distinct().count() == 100
        # restart on the same checkpoint: offsets are committed,
        # nothing re-emits
        run()
        assert registered.read.parquet(out).count() == 100

    def test_stream_rows_match_batch_rows(self, registered, tmp_path):
        out = str(tmp_path / "out2")
        ckpt = str(tmp_path / "ckpt2")
        q = (
            registered.readStream.format("docs_gen")
            .option("n_docs", 50)
            .option("seed", 9)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = sorted(
            map(tuple, registered.read.parquet(out).collect())
        )
        batch = sorted(
            map(
                tuple,
                registered.read.format("docs_gen")
                .option("n_docs", 50)
                .option("seed", 9)
                .load()
                .collect(),
            )
        )
        assert streamed == batch

    def test_advancing_mode_exposes_one_batch_per_poll(self):
        from data_engineering_hs_spark.sources.pyds import DocsGenStreamReader

        r = DocsGenStreamReader(
            {"n_docs": "50", "batch_size": "20", "advance_per_poll": "true"}
        )
        assert r.initialOffset() == {"id": 0}
        assert [r.latestOffset()["id"] for _ in range(4)] == [20, 40, 50, 50]
        parts = r.partitions({"id": 20}, {"id": 40})
        assert sum(p.hi - p.lo for p in parts) == 20
