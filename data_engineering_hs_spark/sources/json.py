"""JSON sources (SURVEY.md §2.1 S5-S6).

- JSONL with explicit nested schema (+.gz): the flagship ingest shape
  (revenue_analysis/main.ipynb:153-160).
- Multi-line document envelope {generated_at, meta, users:[...]} →
  explode to rows (lab02/tasks.ipynb:160-166).

Explicit schemas skip the inference scan and enable nested-schema
pruning; corrupt records are quarantined to a column instead of
failing the job (PERMISSIVE + columnNameOfCorruptRecord), matching
the reference's dirty-data tolerance (~0.1% bad rows by design,
generate_data_json.py:81-82).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    keep_corrupt: bool = False,
    tz: str = "UTC",
) -> DataFrame:
    """S5: JSONL (optionally gzip) with explicit nested StructType.

    tz: per-read `timeZone` option — NAIVE timestamp strings parse as
    UTC instants (the engine contract) even when the caller session's
    spark.sql.session.timeZone points elsewhere; override for
    genuinely local-time feeds.

    keep_corrupt caveat (same raw-scan restriction as CSV, verified
    live on 4.1.2): Spark refuses any query on this frame whose
    pruned read schema is ONLY the corrupt column — e.g.
    `df.filter(corrupt.isNotNull()).count()`. Cache/materialize the
    frame first if you split it that way;
    sources.csv.read_with_quarantine shows the pattern."""
    if keep_corrupt:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("timeZone", tz)
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(paths)


def read_document_array(
    spark: SparkSession,
    path: str,
    doc_schema: T.StructType,
    array_field: str,
    tz: str = "UTC",
) -> DataFrame:
    """S6: one JSON document with an embedded array of records →
    one row per element, envelope fields carried alongside.

    Parses FAILFAST: a malformed/truncated document under the default
    PERMISSIVE mode becomes one all-null row whose NULL array
    explode()s to ZERO rows — an empty result indistinguishable from
    legitimately empty input. An envelope read is one document; a
    parse failure should be loud, not an empty DataFrame."""
    doc = (
        spark.read.option("multiLine", True)
        .option("mode", "FAILFAST")
        .option("timeZone", tz)
        .schema(doc_schema)
        .json(path)
    )
    envelope_cols = [c for c in doc.columns if c != array_field]
    return doc.select(
        *envelope_cols, F.explode(F.col(array_field)).alias("_rec")
    ).select(*envelope_cols, "_rec.*")
