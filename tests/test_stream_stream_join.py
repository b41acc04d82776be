"""Stream-stream join test: watermarked click-to-impression
attribution over two file-source streams."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import types as T

from data_engineering_hs_spark.streaming.pipelines import (
    run_to_memory,
    stream_stream_join,
)

IMP_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.StringType()),
        T.StructField("imp_id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
CLICK_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.StringType()),
        T.StructField("click_id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


class TestStreamStreamJoin:
    def test_click_attribution_within_lag(self, spark, tmp_path):
        t = dt.datetime(2025, 1, 1, 9, 0, 0)
        imp_dir = str(tmp_path / "imps")
        click_dir = str(tmp_path / "clicks")
        os.makedirs(imp_dir)
        os.makedirs(click_dir)
        spark.createDataFrame(
            [
                ("ad1", 1, t),
                ("ad2", 2, t + dt.timedelta(minutes=5)),
                ("ad3", 3, t),
            ],
            IMP_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(imp_dir)
        spark.createDataFrame(
            [
                # ad1 clicked 10 min after impression → attributed
                ("ad1", 100, t + dt.timedelta(minutes=10)),
                # ad2 clicked 2 HOURS later → outside 30-min lag → dropped
                ("ad2", 200, t + dt.timedelta(hours=2, minutes=5)),
                # ad3: click BEFORE the impression → not attributed
                ("ad3", 300, t - dt.timedelta(minutes=5)),
            ],
            CLICK_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(click_dir)

        imps = spark.readStream.schema(IMP_SCHEMA).parquet(imp_dir)
        clicks = (
            spark.readStream.schema(CLICK_SCHEMA)
            .parquet(click_dir)
            .withColumnRenamed("ts", "click_ts")
        )
        joined = stream_stream_join(
            clicks,
            imps,
            on="ad_id",
            left_ts="click_ts",
            right_ts="ts",
            watermark="4 hours",
            max_lag="30 minutes",
        ).select("ad_id", "click_id", "imp_id")
        q, table = run_to_memory(joined, "ss_join", "append")
        got = {(r["ad_id"], r["click_id"], r["imp_id"]) for r in table.collect()}
        assert got == {("ad1", 100, 1)}
        q.stop()

    def test_per_key_watermark_skew(self, spark, tmp_path):
        """Watermarks are GLOBAL, not per-key: a lagging key's rows
        join fine while they arrive within the global watermark delay,
        but once OTHER keys advance event time past the delay, the
        slow key's still-pending matches are dropped (its join state
        is evicted and its late rows are filtered). This pins the
        skew semantics a per-key-lag user must size the watermark for.
        """
        t = dt.datetime(2025, 1, 1, 10, 0, 0)
        imp_dir = str(tmp_path / "imps")
        click_dir = str(tmp_path / "clicks")
        os.makedirs(imp_dir)
        os.makedirs(click_dir)

        def write(dirname, name, rows, schema):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(dirname, name))
            import time as _time

            _time.sleep(1.1)  # distinct mtimes → deterministic order

        m = dt.timedelta(minutes=1)
        h = dt.timedelta(hours=1)
        # trigger 1: three impressions, fast key clicks 5 min later
        write(imp_dir, "f1", [("fast", 1, t), ("slow", 2, t), ("slow2", 3, t)], IMP_SCHEMA)
        write(click_dir, "f1", [("fast", 100, t + 5 * m)], CLICK_SCHEMA)
        # trigger 2: slow key's click lags 8 min behind its impression
        # but the global watermark (30 min) hasn't passed → joins.
        write(imp_dir, "f2", [("fast2", 4, t + 3 * h)], IMP_SCHEMA)
        write(click_dir, "f2", [("slow", 200, t + 8 * m)], CLICK_SCHEMA)
        # trigger 3: fast keys advance event time to 13:00-14:00,
        # dragging the global watermark to ~12:35.
        write(imp_dir, "f3", [("filler", 5, t + 4 * h)], IMP_SCHEMA)
        write(click_dir, "f3", [("fast2", 300, t + 3 * h + 5 * m)], CLICK_SCHEMA)
        # trigger 4: pure filler — state eviction runs one batch AFTER
        # the watermark advances (eviction is best-effort, not a hard
        # late-filter), so an extra trigger must pass before the late
        # arrival for the drop to be observable.
        write(click_dir, "f4", [("filler2", 500, t + 4 * h + 30 * m)], CLICK_SCHEMA)
        # trigger 5: slow2's click arrives at event time 10:10 — within
        # ITS OWN key's lag, but far behind the global watermark; its
        # impression's join state is evicted → no match (no per-key
        # watermark exists to save it).
        write(click_dir, "f5", [("slow2", 400, t + 10 * m)], CLICK_SCHEMA)

        imps = (
            spark.readStream.schema(IMP_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(imp_dir + "/*/")
        )
        clicks = (
            spark.readStream.schema(CLICK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(click_dir + "/*/")
            .withColumnRenamed("ts", "click_ts")
        )
        joined = stream_stream_join(
            clicks,
            imps,
            on="ad_id",
            left_ts="click_ts",
            right_ts="ts",
            watermark="30 minutes",
            max_lag="30 minutes",
        ).select("ad_id", "click_id", "imp_id")
        q, table = run_to_memory(joined, "ss_skew", "append")
        got = {(r["ad_id"], r["click_id"], r["imp_id"]) for r in table.collect()}
        assert got == {("fast", 100, 1), ("slow", 200, 2), ("fast2", 300, 4)}
        q.stop()

    def test_left_outer_emits_unmatched_after_watermark(
        self, spark, tmp_path
    ):
        """Outer results are withheld until the watermark PROVES no
        match can still arrive: the unmatched click emits with a null
        impression only in the trigger after later data advances the
        watermark past its join window."""
        t = dt.datetime(2025, 1, 1, 9, 0, 0)
        imp_dir = str(tmp_path / "imps")
        click_dir = str(tmp_path / "clicks")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(imp_dir)
        os.makedirs(click_dir)
        spark.createDataFrame([("ad1", 1, t)], IMP_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(imp_dir)
        spark.createDataFrame(
            [
                ("ad1", 100, t + dt.timedelta(minutes=10)),  # matches
                ("ad9", 900, t),  # no impression ever
            ],
            CLICK_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(click_dir)

        def drain():
            imps = spark.readStream.schema(IMP_SCHEMA).parquet(imp_dir)
            clicks = (
                spark.readStream.schema(CLICK_SCHEMA)
                .parquet(click_dir)
                .withColumnRenamed("ts", "click_ts")
            )
            joined = stream_stream_join(
                clicks,
                imps,
                on="ad_id",
                left_ts="click_ts",
                right_ts="ts",
                watermark="10 minutes",
                max_lag="30 minutes",
                how="left_outer",
            ).select("ad_id", "click_id", "imp_id")
            q = (
                joined.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        got1 = {
            (r["ad_id"], r["click_id"], r["imp_id"])
            for r in spark.read.parquet(out_dir).collect()
        }
        # inner results emit immediately; the unmatched click is NOT
        # final yet (a matching impression could still arrive)
        assert got1 == {("ad1", 100, 1)}

        # later data on BOTH sides advances the watermark past ad9's
        # join window — the query watermark is the MIN across all
        # watermarked inputs (the same global-watermark fact
        # test_per_key_watermark_skew pins), so advancing only the
        # click side would hold the join watermark at the stale imp
        # side forever. The new watermark only takes effect at the
        # NEXT trigger (watermarks commit at batch end), so a third
        # drain is what actually evicts and emits the unmatched row —
        # the extra trigger of latency every outer stream-stream join
        # carries.
        spark.createDataFrame(
            [("ad1", 101, t + dt.timedelta(hours=2))], CLICK_SCHEMA
        ).coalesce(1).write.mode("append").parquet(click_dir)
        spark.createDataFrame(
            [("ad1", 9, t + dt.timedelta(hours=2))], IMP_SCHEMA
        ).coalesce(1).write.mode("append").parquet(imp_dir)
        drain()
        spark.createDataFrame(
            [("ad1", 102, t + dt.timedelta(hours=3))], CLICK_SCHEMA
        ).coalesce(1).write.mode("append").parquet(click_dir)
        drain()
        got2 = {
            (r["ad_id"], r["click_id"], r["imp_id"])
            for r in spark.read.parquet(out_dir).collect()
        }
        assert ("ad9", 900, None) in got2, got2
        assert ("ad1", 100, 1) in got2
