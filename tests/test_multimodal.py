"""Multimodal column plumbing tests — binary ingestion, Arrow-batched
feature extraction with the deterministic fake decoder (real codecs
are stubbed; see operators.multimodal docstring)."""

from __future__ import annotations

import os

import pytest

from data_engineering_hs_spark.operators import multimodal as M


class TestMultimodal:
    def test_binary_ingest_and_features(self, spark, tmp_path):
        d = str(tmp_path / "imgs")
        os.makedirs(d)
        for i in range(5):
            with open(os.path.join(d, f"img_{i}.bin"), "wb") as f:
                f.write(bytes([i]) * (100 + i))
        df = M.load_binary_dir(spark, d, kind="image")
        assert df.count() == 5
        assert df.schema["content"].dataType.typeName() == "binary"
        sizes = {r["meta"]["n_bytes"] for r in df.collect()}
        assert sizes == {100, 101, 102, 103, 104}

        feats = M.extract_features(df, M.deterministic_fake_decode, batch_size=2)
        rows = feats.collect()
        assert len(rows) == 5
        assert all(len(r["features"]) == M.FEATURE_DIM for r in rows)
        # determinism: same content → same features across runs
        again = {r["media_id"]: r["features"] for r in
                 M.extract_features(df, M.deterministic_fake_decode).collect()}
        first = {r["media_id"]: r["features"] for r in rows}
        assert again == first

    def test_resize_plumbing(self, spark, tmp_path):
        import os

        d = str(tmp_path / "imgs2")
        os.makedirs(d)
        for i in range(3):
            with open(os.path.join(d, f"i{i}.bin"), "wb") as f:
                f.write(bytes([i]) * 64)
        df = M.load_binary_dir(spark, d, kind="image")
        out = M.resize_images(df, width=8, height=4)
        rows = out.collect()
        assert len(rows) == 3
        assert all(len(bytes(r["content"])) == 32 for r in rows)
        assert all((r["width"], r["height"]) == (8, 4) for r in rows)

    def test_frame_sampling_changes_cardinality(self, spark, tmp_path):
        import os

        d = str(tmp_path / "vids")
        os.makedirs(d)
        with open(os.path.join(d, "v.bin"), "wb") as f:
            f.write(bytes(range(100)))
        df = M.load_binary_dir(spark, d, kind="video")
        frames = M.sample_frames(df, n_frames=4)
        rows = sorted(frames.collect(), key=lambda r: r["frame_no"])
        assert [r["frame_no"] for r in rows] == [0, 1, 2, 3]
        assert bytes(rows[0]["frame"]) == bytes(range(25))

    def test_decode_image_requires_registered_codec(self, spark):
        # no backend in this container and autodetect finds none
        assert M.autodetect_codecs() == []
        with pytest.raises(NotImplementedError, match="no codec registered"):
            M.decode_image(None)

    def test_registered_codec_drives_decode_image(self, spark, tmp_path):
        import os

        d = tmp_path / "imgs"
        os.makedirs(d)
        (d / "a.bin").write_bytes(bytes(range(64)))
        df = M.load_binary_dir(spark, str(d), "image")
        M.CODECS.register("image", "decode", M.deterministic_fake_decode,
                          backend="test-fake")
        try:
            assert M.CODECS.backend("image", "decode") == "test-fake"
            rows = M.decode_image(df).collect()
            assert len(rows) == 1
            assert len(rows[0]["features"]) == M.FEATURE_DIM
        finally:
            M.CODECS._codecs.clear()
            M.CODECS._backend.clear()

    def test_repartition_by_byte_budget(self, spark):
        df = spark.range(10).withColumnRenamed("id", "media_id")
        out = M.repartition_for_media(df, total_bytes=10 << 30,
                                      target_bytes_per_task=1 << 30)
        assert out.rdd.getNumPartitions() == 10
