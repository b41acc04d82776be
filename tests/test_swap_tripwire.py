"""Pre-swap concurrent-writer tripwire (r13, verdict item): the
compaction family (compact_parquet, compact_ingest_store,
retire_runs, compact_cell_store) documents 'never concurrent with an
active writer', but before this check a batch committed between the
staging read and the rename SILENTLY VANISHED in the swap. Each test
injects a commit into the exact race window via the
sources.parquet._pre_swap_test_hook seam and asserts: loud
RuntimeError, live store untouched (interloper's data included), no
staged-tmp or .__old debris left behind."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_engineering_hs_spark.sources import parquet as pq_mod


def _inject_copy_of_existing_file(store: str) -> None:
    """Simulate a concurrent commit: drop one more data file into the
    store (a copy of an existing part file under a new name — exactly
    what a foreachBatch append produces, modulo content)."""
    files = [
        f
        for f in glob.glob(os.path.join(store, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith(("_", "."))
    ]
    src = files[0]
    dst = os.path.join(os.path.dirname(src), "part-interloper.parquet")
    shutil.copyfile(src, dst)


@pytest.fixture
def hook():
    """Arm the test seam, always disarm after."""
    def arm(fn):
        pq_mod._pre_swap_test_hook = fn

    yield arm
    pq_mod._pre_swap_test_hook = None


def _no_debris(store: str) -> bool:
    norm = store.rstrip("/")
    return not os.path.exists(norm + ".__compact") and not os.path.exists(
        norm + ".__old"
    )


class TestSwapTripwire:
    def test_compact_parquet_aborts_and_preserves_commit(
        self, spark, tmp_path, hook
    ):
        store = str(tmp_path / "flat")
        spark.range(100).repartition(4).write.parquet(store)
        hook(_inject_copy_of_existing_file)
        with pytest.raises(RuntimeError, match="concurrent writer"):
            pq_mod.compact_parquet(spark, store, target_file_bytes=1 << 30)
        # live store intact INCLUDING the interloper's file; no debris
        assert spark.read.parquet(store).count() > 100
        assert _no_debris(store)
        # disarmed, the same compaction succeeds
        pq_mod._pre_swap_test_hook = None
        st = pq_mod.compact_parquet(spark, store, target_file_bytes=1 << 30)
        assert st["files_after"] == 1

    def test_compact_ingest_store_aborts_on_mid_compaction_batch(
        self, spark, tmp_path, hook
    ):
        from pyspark.sql import types as T2

        from data_engineering_hs_spark.streaming.pipelines import (
            _dedup_ingest_batch,
            compact_ingest_store,
            retire_runs,
        )

        schema = T2.StructType(
            [
                T2.StructField("doc_id", T2.LongType()),
                T2.StructField("text", T2.StringType()),
            ]
        )
        store = str(tmp_path / "fp")
        sink = str(tmp_path / "corpus")
        mk = lambda rows: spark.createDataFrame(rows, schema)
        _dedup_ingest_batch(mk([(1, "alpha")]), 0, store, sink, "text", "doc_id")
        _dedup_ingest_batch(mk([(2, "beta")]), 1, store, sink, "text", "doc_id")
        _dedup_ingest_batch(mk([(3, "gamma")]), 0, store, sink, "text", "doc_id", run_ns="dead")
        pre = sorted(r.fingerprint for r in spark.read.parquet(store).collect())

        # a trigger commits batch 2 inside the race window
        def commit_batch(path):
            _dedup_ingest_batch(
                mk([(4, "delta")]), 2, store, sink, "text", "doc_id"
            )

        hook(commit_batch)
        with pytest.raises(RuntimeError, match="concurrent writer"):
            compact_ingest_store(spark, store)
        # the mid-compaction batch's fingerprint is alive, store intact
        post = sorted(r.fingerprint for r in spark.read.parquet(store).collect())
        assert len(post) == len(pre) + 1 and set(pre) <= set(post)
        assert _no_debris(store)

        # retire_runs goes through the same guarded swap
        hook(commit_batch)
        with pytest.raises(RuntimeError, match="concurrent writer"):
            retire_runs(
                spark, store, runs=["dead"], checkpoints_gone_for_good=True
            )
        assert _no_debris(store)
        # disarmed, both succeed on the (now larger) store
        pq_mod._pre_swap_test_hook = None
        st = retire_runs(
            spark, store, runs=["dead"], checkpoints_gone_for_good=True
        )
        assert st["runs_retired"] == ["dead"]
        final = sorted(r.fingerprint for r in spark.read.parquet(store).collect())
        # the second injected commit REPLAYS batch 2 (idempotent — no
        # new fingerprint); retirement folds, never drops content
        assert len(final) == len(pre) + 1

    def test_post_park_verification_rolls_back_late_commit(
        self, spark, tmp_path
    ):
        # r14 (ADVICE): the pre-swap check NARROWS the race but a
        # commit between check_no_concurrent_writer and the park
        # rename still vanished. swap_in(staged=...) re-verifies the
        # parked file set AFTER the rename freezes the store; this
        # injects a commit into exactly that residual window via the
        # _post_check_test_hook seam and asserts the swap rolls back
        # with the late batch alive.
        store = str(tmp_path / "flat")
        spark.range(100).repartition(4).write.parquet(store)

        def late_commit(path):
            _inject_copy_of_existing_file(path)

        pq_mod._post_check_test_hook = late_commit
        try:
            with pytest.raises(RuntimeError, match="Rolled back"):
                pq_mod.compact_parquet(spark, store, target_file_bytes=1 << 30)
        finally:
            pq_mod._post_check_test_hook = None
        # live store restored INCLUDING the late commit; no debris
        assert spark.read.parquet(store).count() > 100
        assert _no_debris(store)
        # disarmed, the same compaction succeeds and keeps every row
        n_before = spark.read.parquet(store).count()
        st = pq_mod.compact_parquet(spark, store, target_file_bytes=1 << 30)
        assert st["files_after"] == 1
        assert spark.read.parquet(store).count() == n_before

    def test_compact_cell_store_aborts_on_concurrent_append(
        self, spark, tmp_path, hook
    ):
        from data_engineering_hs_spark.operators.similarity import (
            build_ivf_store,
            centroids,
            compact_cell_store,
        )

        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        store = str(tmp_path / "cells")
        build_ivf_store(emb, centroids(emb), store)
        n0 = spark.read.parquet(store).count()
        hook(_inject_copy_of_existing_file)
        with pytest.raises(RuntimeError, match="concurrent writer"):
            compact_cell_store(spark, store)
        assert _no_debris(store)
        # sidecar meta untouched and store still readable
        assert os.path.exists(os.path.join(store, "_store_meta.json"))
        assert spark.read.parquet(store).count() > n0
