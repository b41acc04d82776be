"""Custom Python DataSource (Spark 4 datasource API): a deterministic
synthetic-documents generator, `spark.read.format("docs_gen")`.

Why it exists: the reference generates its lab corpora with
single-process scripts (generate_data_json.py, generate_fuel_exports
.py); at engine scale, test/synthetic data must be produced INSIDE the
cluster — a V2 source with real partition planning, so a 10-billion-doc
corpus generates in parallel with no driver materialization and no
shuffle. The implementation exercises the full modern source surface:

- `partitions()` → one InputPartition per id-range slice;
- `pushFilters()` (Spark 4.1) → doc_id range predicates narrow the
  slices BEFORE planning, so filtered reads skip whole partitions
  (the Python-source analog of parquet row-group pruning);
- `read(partition)` → generates rows for its slice only.

Content is a seeded xxhash-free pure-Python LCG over a fixed
vocabulary — deterministic for (seed, doc_id) regardless of
partition count, asserted in tests.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_VOCAB = (
    "key value table row scan filter join merge sort window "
    "batch stream spark query agg hash part order group line"
).split()

SCHEMA_DDL = "doc_id bigint, text string, n_tokens int"


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


def _doc(seed: int, doc_id: int) -> tuple[int, str, int]:
    # 64-bit LCG (Knuth MMIX constants) keyed by (seed, doc_id):
    # partition-count independent by construction.
    state = (seed * 0x9E3779B97F4A7C15 + doc_id + 1) & (2**64 - 1)
    words = []
    n = 5 + (state >> 59)  # 5..36 tokens
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        words.append(_VOCAB[(state >> 33) % len(_VOCAB)])
    return doc_id, " ".join(words), len(words)


class DocsGenReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 8))
        self.lo, self.hi = 0, self.n_docs

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # accept doc_id range predicates by narrowing [lo, hi);
        # everything else is returned for Spark to re-apply.
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col != "doc_id":
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [_Range(0, 0)]
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _Range):
        for doc_id in range(partition.lo, partition.hi):
            yield _doc(self.seed, doc_id)


class DocsGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docs_gen"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return DocsGenReader(schema, self.options)

    def streamReader(self, schema: StructType) -> "DocsGenStreamReader":
        return DocsGenStreamReader(self.options)


def register(spark) -> None:
    # pushFilters() requires the (4.1, default-off) pushdown flag;
    # a reader that implements it is REJECTED outright when the flag
    # is down, so registration flips it for this session.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocsGenDataSource)


class DocsGenStreamReader(DataSourceStreamReader):
    """Offset-based streaming variant: micro-batches emit doc-id
    ranges, partitioned like the batch reader. Offsets
    are plain dicts ({"id": n}) checkpointed by the engine — replay
    after restart regenerates the SAME rows for the same offset range
    (LCG determinism), giving exactly-once output with an idempotent
    sink. The broker-free analog of a Kafka source: real offset
    tracking, real recovery, fully testable in-process."""

    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", 20))
        self.max_id = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 4))
        # advance_per_poll=true: each latestOffset() poll exposes one
        # more batch (per-trigger incremental arrival, for
        # processing-time triggers). Default: the whole corpus is
        # available immediately, so availableNow drains it in one
        # catch-up batch — the deterministic mode tests rely on.
        self.advance = str(options.get("advance_per_poll", "false")).lower() == "true"

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        if not self.advance:
            return {"id": self.max_id}
        cur = getattr(self, "_cur", 0)
        nxt = min(cur + self.batch_size, self.max_id)
        self._cur = nxt
        return {"id": nxt}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["id"]), int(end["id"])
        # Restart resync for the advance_per_poll cursor: the poll
        # cursor is in-memory, so after a checkpoint restart Spark's
        # start offset can be AHEAD of it — without the fast-forward,
        # latestOffset would regress below the committed offset and
        # re-plan already-emitted ranges. start is authoritative.
        self._cur = max(getattr(self, "_cur", 0), lo)
        if hi <= lo:
            return [_Range(0, 0)]
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _Range):
        for doc_id in range(partition.lo, partition.hi):
            yield _doc(self.seed, doc_id)

    def commit(self, end: dict) -> None:
        # same fast-forward on commit: monotonic cursor even if
        # partitions() was not consulted for a batch
        self._cur = max(getattr(self, "_cur", 0), int(end["id"]))


