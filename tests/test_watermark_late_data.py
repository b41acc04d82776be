"""Late-data semantics: a row older than the watermark must be DROPPED
from a windowed aggregation (the §2.9 watermark gap, exercised with a
genuine multi-batch replay via maxFilesPerTrigger=1)."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


class TestLateDataDrop:
    def test_late_row_dropped_from_window(self, spark, tmp_path):
        d = str(tmp_path / "stream")
        os.makedirs(d)

        def write_file(name, rows):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(d, name))

        t = dt.datetime(2025, 1, 1, 10, 0, 0)

        # Spark evicts window state at batch end using the watermark
        # derived from PRIOR batches, and a late row is only dropped
        # once its window's state is gone — so the drop needs three
        # batches (measured: in a two-batch replay the late row still
        # merges, because eviction hasn't run when it arrives).
        #
        # Batch 1: two rows in [10:00, 11:00) + one at 12:00
        #          (wm after: 11:30).
        write_file(
            "batch1",
            [
                ("a", t),
                ("a", t + dt.timedelta(minutes=30)),
                ("a", t + dt.timedelta(hours=2)),
            ],
        )
        time.sleep(1.1)  # distinct mtimes → deterministic batch order
        # Batch 2: 12:30 row. At its end, wm=11:30 evicts+emits the
        # 10:00 window with n=2.
        write_file("batch2", [("a", t + dt.timedelta(hours=2, minutes=30))])
        time.sleep(1.1)
        # Batch 3: LATE row at 10:15 — its window is already finalized
        # → dropped; 13:30 advances wm to 13:00, finalizing 12:00.
        write_file(
            "batch3",
            [
                ("a", t + dt.timedelta(minutes=15)),
                ("a", t + dt.timedelta(hours=3, minutes=30)),
            ],
        )

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/*/")
        )
        windowed = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour"), "k")
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "k", "n")
        )
        q = (
            windowed.writeStream.format("memory")
            .queryName("late_test")
            .outputMode("append")  # append emits only FINALIZED windows
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["ws"].hour, r["n"]) for r in spark.table("late_test").collect()
        }
        # Window 10:00 finalized with n=2 — the late 10:15 row did NOT
        # count. Window 12:00 finalized with n=2. 13:00 not finalized.
        assert (10, 2) in got, got
        assert (12, 2) in got, got
        assert all(h != 13 for h, _ in got)
        q.stop()
