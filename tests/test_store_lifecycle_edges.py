"""Empty/degenerate-cardinality contracts for the store lifecycles
(r14 verdict item): compact/retire/append on empty or missing stores,
retiring every run, 0-row micro-batches, k > corpus size, empty
increments. Each contract is pinned as either a clean no-op (zero
stats, store untouched) or a loud, SPECIFIC error — never a raw
UNABLE_TO_INFER_SCHEMA/PATH_NOT_FOUND from deep inside a parquet
scan (what the empty-existing-dir cases threw before this round)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


class TestCompactParquetEdges:
    def test_empty_existing_dir_is_noop(self, spark, tmp_path):
        from data_engineering_hs_spark.sources.parquet import compact_parquet

        d = str(tmp_path / "empty")
        os.makedirs(d)
        assert compact_parquet(spark, d) == {
            "files_before": 0,
            "files_after": 0,
            "bytes": 0,
        }
        assert os.listdir(d) == []  # untouched, no tmp debris

    def test_missing_dir_is_loud(self, spark, tmp_path):
        from data_engineering_hs_spark.sources.parquet import compact_parquet

        with pytest.raises(FileNotFoundError):
            compact_parquet(spark, str(tmp_path / "nope"))

    def test_single_file_store_roundtrips(self, spark, tmp_path):
        from data_engineering_hs_spark.sources.parquet import compact_parquet

        d = str(tmp_path / "one")
        spark.range(7).coalesce(1).write.parquet(d)
        st = compact_parquet(spark, d, target_file_bytes=1 << 30)
        assert st["files_before"] == 1 and st["files_after"] == 1
        assert spark.read.parquet(d).count() == 7


class TestIngestStoreEdges:
    def _batch(self, spark, rows):
        from pyspark.sql import types as T2

        schema = T2.StructType(
            [
                T2.StructField("doc_id", T2.LongType()),
                T2.StructField("text", T2.StringType()),
            ]
        )
        return spark.createDataFrame(rows, schema)

    def test_zero_row_batches_roundtrip(self, spark, tmp_path):
        from data_engineering_hs_spark.streaming.pipelines import (
            _dedup_ingest_batch,
            compact_ingest_store,
        )

        store, sink = str(tmp_path / "fp"), str(tmp_path / "corpus")
        # 0-row first batch, rows, 0-row again — the empty-source
        # stream shape (a trigger with nothing to read)
        _dedup_ingest_batch(self._batch(spark, []), 0, store, sink, "text", "doc_id")
        _dedup_ingest_batch(
            self._batch(spark, [(1, "a")]), 1, store, sink, "text", "doc_id"
        )
        _dedup_ingest_batch(self._batch(spark, []), 2, store, sink, "text", "doc_id")
        assert spark.read.parquet(store).count() == 1
        assert spark.read.parquet(sink).count() == 1
        st = compact_ingest_store(spark, store)
        assert st["files_after"] >= 1
        assert spark.read.parquet(store).count() == 1

    def test_compact_empty_existing_store_is_noop(self, spark, tmp_path):
        from data_engineering_hs_spark.streaming.pipelines import (
            compact_ingest_store,
        )

        d = str(tmp_path / "fp")
        os.makedirs(d)
        assert compact_ingest_store(spark, d) == {
            "files_before": 0,
            "files_after": 0,
            "partitions_before": 0,
            "partitions_after": 0,
        }

    def test_retire_missing_store_and_absent_run_are_loud(
        self, spark, tmp_path
    ):
        from data_engineering_hs_spark.streaming.pipelines import retire_runs

        with pytest.raises(ValueError, match="does not exist"):
            retire_runs(
                spark,
                str(tmp_path / "nope"),
                runs=["x"],
                checkpoints_gone_for_good=True,
            )
        d = str(tmp_path / "fp")
        os.makedirs(d)
        # empty store: the named run is absent — typo protection fires
        with pytest.raises(ValueError, match="not present"):
            retire_runs(
                spark, d, runs=["x"], checkpoints_gone_for_good=True
            )

    def test_retire_named_empty_run_dir_removes_it(self, spark, tmp_path):
        from data_engineering_hs_spark.streaming.pipelines import retire_runs

        d = str(tmp_path / "fp")
        os.makedirs(os.path.join(d, "run=dead"))
        st = retire_runs(
            spark, d, runs=["dead"], checkpoints_gone_for_good=True
        )
        assert st["runs_retired"] == ["dead"]
        assert not os.path.exists(os.path.join(d, "run=dead"))

    def test_retire_every_run_preserves_all_rows(self, spark, tmp_path):
        from data_engineering_hs_spark.streaming.pipelines import (
            _dedup_ingest_batch,
            retire_runs,
        )

        store, sink = str(tmp_path / "fp"), str(tmp_path / "corpus")
        _dedup_ingest_batch(
            self._batch(spark, [(1, "a")]), 0, store, sink, "text", "doc_id",
            run_ns="r1",
        )
        _dedup_ingest_batch(
            self._batch(spark, [(2, "b")]), 0, store, sink, "text", "doc_id",
            run_ns="r2",
        )
        st = retire_runs(
            spark, store, runs=["r1", "r2"], checkpoints_gone_for_good=True
        )
        assert st["runs_retired"] == ["r1", "r2"]
        after = spark.read.parquet(store)
        # every fingerprint survives, folded under run=compacted
        assert after.count() == 2
        assert [r["run"] for r in after.select("run").distinct().collect()] == [
            "compacted"
        ]


class TestCellStoreEdges:
    @pytest.fixture()
    def store(self, spark, tmp_path):
        from data_engineering_hs_spark.operators.similarity import (
            build_ivf_store,
            kmeans_centroids,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).localCheckpoint(eager=True)
        cents = kmeans_centroids(emb.limit(50), k=4, iters=1).localCheckpoint(
            eager=True
        )
        path = str(tmp_path / "cells")
        build_ivf_store(emb, cents, path)
        return emb, cents, path

    def test_compact_missing_and_empty_store(self, spark, tmp_path):
        from data_engineering_hs_spark.operators.similarity import (
            compact_cell_store,
        )

        with pytest.raises(ValueError, match="no store at"):
            compact_cell_store(spark, str(tmp_path / "nope"))
        d = str(tmp_path / "cells")
        os.makedirs(d)
        assert compact_cell_store(spark, d) == {
            "files_before": 0,
            "files_after": 0,
        }

    def test_empty_increment_append_is_noop(self, spark, store):
        from data_engineering_hs_spark.operators.similarity import (
            append_to_cell_store,
            ivf_topk,
        )

        emb, cents, path = store
        meta_before = json.load(open(os.path.join(path, "_store_meta.json")))
        append_to_cell_store(emb.filter("vec_id < 0"), cents, path)
        meta_after = json.load(open(os.path.join(path, "_store_meta.json")))
        # XOR-fold of zero rows: stamp bit-identical, store still
        # passes verify_corpus on the original corpus
        assert meta_before == meta_after
        assert (
            ivf_topk(emb, emb.limit(2), cents, k=3, vector_store=path).count()
            > 0
        )

    def test_store_query_with_empty_caller_corpus_is_loud(self, spark, store):
        from data_engineering_hs_spark.operators.similarity import ivf_topk

        emb, cents, path = store
        with pytest.raises(ValueError, match="different corpus"):
            ivf_topk(
                emb.filter("vec_id < 0"),
                emb.limit(2),
                cents,
                k=3,
                vector_store=path,
            )

    def test_topk_with_k_beyond_corpus(self, spark):
        from data_engineering_hs_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
            kmeans_centroids,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).limit(3)
        q = emb.limit(1)
        # k > corpus: every other vector ranks, nothing pads
        assert brute_force_topk(emb, q, k=100).count() == 2
        cents = kmeans_centroids(emb, k=2, iters=1)
        assert ivf_topk(emb, q, cents, k=100, nprobe=2).count() == 2


class TestUpsertSinkEdges:
    def test_zero_row_batch_is_noop(self, spark, tmp_path):
        from data_engineering_hs_spark.sources.upsert import upsert_parquet

        tgt = str(tmp_path / "tgt")
        spark.range(5).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        ).write.parquet(tgt)
        zero = spark.range(0).select(
            F.col("id").alias("k"), F.lit(2).alias("v")
        )
        assert upsert_parquet(spark, tgt, zero, keys=["k"]) == 0
        after = spark.read.parquet(tgt)
        assert after.count() == 5
        assert after.filter("v != 1").count() == 0  # untouched

    def test_zero_row_batch_into_missing_target(self, spark, tmp_path):
        from data_engineering_hs_spark.sources.upsert import upsert_parquet

        tgt = str(tmp_path / "newt")
        zero = spark.range(0).select(
            F.col("id").alias("k"), F.lit(2).alias("v")
        )
        assert upsert_parquet(spark, tgt, zero, keys=["k"]) == 0
