"""Stream-stream join test: watermarked click-to-impression
attribution over two file-source streams."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
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
