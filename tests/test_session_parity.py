"""Streaming session_window vs batch lag-gap sessionization: two
independent implementations of 30-minute-gap sessions over the same
events must agree exactly — an internal consistency check neither
oracle covers (session windows aren't SQL-expressible single-pass)."""

from __future__ import annotations

from data_engineering_hs_spark.queries import REGISTRY, load_all
from tests.conftest import SF0001

load_all()


class TestSessionParity:
    def test_stream_and_batch_sessions_agree(self, spark):
        streaming = REGISTRY["st_session_windows"].fn(spark, SF0001)
        batch = REGISTRY["w_sessionize_batch"].fn(spark, SF0001)
        s_rows = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in streaming.collect()
        }
        b_rows = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in batch.collect()
        }
        assert s_rows == b_rows
        assert len(s_rows) > 0

    def test_exact_gap_boundary_merges(self, spark):
        """An event at EXACTLY prev + gap joins the session: Spark's
        session_window treats a touching window as overlapping, so
        the lag-gap batch twin must split on strictly `>` gap (not
        `>=`). Empirically pinned so the oracles' `>` predicate is
        evidence, not assumption."""
        from pyspark.sql import functions as F

        from data_engineering_hs_spark.streaming.pipelines import (
            sessionized_counts,
        )

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00"),
                (1, "2024-01-01 00:30:00"),  # exactly gap -> merges
                (1, "2024-01-01 01:00:01"),  # gap exceeded -> splits
            ],
            ["user_id", "ts"],
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        # batch groupBy path (session_window works on batch frames too)
        out = sessionized_counts(df).collect()
        got = sorted((r["n_events"],) for r in out)
        assert got == [(1,), (2,)], out
