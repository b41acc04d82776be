"""Micro-batch cost split for the streaming family under load (r17,
verdict item 5): what the trigger lifecycle costs vs what the
per-batch PLAN costs, measured from Spark's own progress events
(durationMs: addBatch = plan execution, the rest = lifecycle), not
from wall-clock guesses.

Volume driver: a prepared file-source directory of V deterministic
events split across NF files, drained with one availableNow trigger
through tumbling_counts (shuffle agg), sessionized_counts (session
windows) and dedup_within_watermark (state store), then the same
events as ONE BATCH frame through the identical operator — the delta
is the structured-streaming tax at volume.

Usage: python scripts_profile_streaming_r17.py [n_events] [n_files]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F

from data_engineering_hs_spark.session import get_spark
from data_engineering_hs_spark.streaming import pipelines as P

V = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 8

spark = get_spark(app_name="profile_streaming_r17")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

work = tempfile.mkdtemp(prefix="stream_prof_")
src = os.path.join(work, "src")


def events_df():
    return spark.range(V).select(
        F.timestamp_seconds(F.lit(1_600_000_000) + (F.col("id") % 86_400)).alias("ts"),
        F.concat(F.lit("e"), F.pmod(F.xxhash64("id"), F.lit(20))).alias(
            "event_type"
        ),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50_000)).alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000))).alias("value"),
    )


events_df().repartition(NF).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema


def drain(op, name, **kw):
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max(1, NF // 4)
    ).parquet(src)
    out = op(stream, **kw)
    ckpt = os.path.join(work, f"ckpt_{name}")
    sink = os.path.join(work, f"sink_{name}")
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), f"{name}: drain timed out"
    wall = time.perf_counter() - t0
    prog = [
        p if isinstance(p, dict) else json.loads(str(p))
        for p in q.recentProgress
    ]
    add_batch = sum(p["durationMs"].get("addBatch", 0) for p in prog)
    total_ms = sum(sum(p["durationMs"].values()) for p in prog)
    rows = sum(p.get("numInputRows", 0) for p in prog)
    print(
        f"{name}: wall {wall:.2f}s over {len(prog)} batches, {rows} rows; "
        f"addBatch(plan) {add_batch/1000:.2f}s, "
        f"other lifecycle {(total_ms-add_batch)/1000:.2f}s",
        flush=True,
    )


def batch_equiv(op, name, **kw):
    df = op(spark.read.parquet(src), **kw)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{name} (same op, one batch frame, noop): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)


try:
    drain(P.tumbling_counts, "tumbling_counts")
    batch_equiv(P.tumbling_counts, "tumbling_counts")
    drain(P.sessionized_counts, "sessionized_counts")
    drain(
        P.dedup_within_watermark,
        "dedup_within_watermark",
        keys=("user_id", "event_type"),
    )
finally:
    shutil.rmtree(work, ignore_errors=True)
