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
