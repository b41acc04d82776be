"""Key-value state operators (SURVEY.md §2.1 S26 — Redis analog).

The reference uses Redis for point GET/SET, atomic INCR counters, and
TTL'd keys (lab04-mini-lab-databases/coffee_shop/main.ipynb:50,73-74,
96-106). Engine mapping:

- point lookup → broadcast-join against a dimension (batch), covered
  by operators.relational.broadcast_left_join;
- atomic counters → stateful streaming groupBy count, or, for custom
  TTL semantics, applyInPandasWithState with a processing-time
  timeout (the documented divergence: Redis TTL is wall-clock per
  key; state timeout is per-group and resets on update — see
  SURVEY.md §7 risk register);
- TTL filter (batch) → filter(now < expiry), ttl_filter below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)
COUNTER_STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def ttl_filter(df: DataFrame, expiry_col: str) -> DataFrame:
    """Batch TTL: keep unexpired rows (SET ex= analog at read time)."""
    return df.filter(F.col(expiry_col) > F.current_timestamp())


def stateful_counter(
    keyed: DataFrame,
    key_col: str = "key",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming INCR with optional TTL: per-key running count kept in
    state; with ttl_ms set, a key idle past the TTL expires and its
    count resets (Redis `INCR` + `EXPIRE` approximation)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n = sum(len(pdf) for pdf in pdfs)
        prev = state.get[0] if state.exists else 0
        total = prev + n
        state.update((total,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "count": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(F.col(key_col).alias("key")).applyInPandasWithState(
        update,
        outputStructType=COUNTER_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def _tws_available() -> bool:
    """transformWithState's Python driver worker speaks protobuf to
    the JVM; without a working google.protobuf the runner crashes at
    init (sandbox state — same class of env gate as the live-Kafka
    test)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_counter_tws(
    keyed: DataFrame,
    key_col: str = "key",
    ttl_ms: int | None = None,
) -> DataFrame:
    """stateful_counter on the Spark 4 transformWithStateInPandas API:
    ValueState instead of the flat GroupState tuple, per-state TTL
    handled by the store itself (closer to Redis EXPIRE than the
    applyInPandasWithState timeout, which resets on every update and
    is per-group). Output parity with stateful_counter is asserted in
    tests when the runtime supports the API (env-gated on protobuf).

    Requires the RocksDB state store provider:
      spark.sql.streaming.stateStore.providerClass =
        ...state.RocksDBStateStoreProvider
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = T.StructType([T.StructField("n", T.LongType())])

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.count = handle.getValueState(
                "count", state_schema, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = sum(len(pdf) for pdf in rows)
            prev = self.count.get()[0] if self.count.exists() else 0
            total = prev + n
            self.count.update((total,))
            yield pd.DataFrame({"key": [key[0]], "count": [total]})

        def close(self):
            pass

    return keyed.groupBy(F.col(key_col).alias("key")).transformWithStateInPandas(
        Counter(),
        outputStructType=COUNTER_SCHEMA,
        outputMode="Update",
        # state TTL is only legal under ProcessingTime — with
        # timeMode="None" Spark rejects the getValueState ttl at
        # query start (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_
        # ASSIGN_TTL), so the TTL path could never run
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
