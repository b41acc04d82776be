"""Rich-typed ingest tests: the fuel_sales schema (B7 — decimals,
nested struct, arrays, timestamps) through the file-watch upsert
pipeline, and the airport-codes inference edge case (B12)."""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_hs_spark.catalog import FUEL_SALES_SCHEMA
from data_engineering_hs_spark.sources.csv import read_with_header
from data_engineering_hs_spark.streaming.pipelines import file_watch_ingest


def _fuel_rows():
    ts = dt.datetime(2025, 3, 1, 10, 0, 0)
    return [
        (
            "TXN-001", 7, (3, "upper"), "Nostromo", "WY", "E. Ripley",
            "Human", "hydrazine", 120.5, Decimal("4.25"), Decimal("512.13"),
            ["wash", "restock"], False, ts, dt.date(2025, 3, 1), 12.5, -7.25,
        ),
        (
            "TXN-002", 7, (1, "lower"), "Serenity", "Firefly", "M. Reynolds",
            "Human", "fusion", 80.0, Decimal("6.10"), Decimal("488.00"),
            ["refuel"], True, ts, dt.date(2025, 3, 1), -3.0, 22.0,
        ),
    ]


class TestFuelSalesRichTypes:
    def test_roundtrip_and_idempotent_ingest(self, spark, tmp_path):
        src = str(tmp_path / "drops")
        target = str(tmp_path / "fuel_table")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)
        df = spark.createDataFrame(_fuel_rows(), FUEL_SALES_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(FUEL_SALES_SCHEMA).parquet(src)
        # quarantine_dir is REQUIRED with valid_predicate (a predicate
        # without one silently drops failing rows); both rows are
        # valid here so the quarantine stays empty
        q = file_watch_ingest(
            stream, target, ckpt, keys=("transaction_id",),
            quarantine_dir=str(tmp_path / "bad"),
            valid_predicate=F.col("fuel_units") >= 0,
        )
        q.awaitTermination()
        got = {r["transaction_id"]: r for r in spark.read.parquet(target).collect()}
        assert set(got) == {"TXN-001", "TXN-002"}
        # rich types survive the full pipeline
        assert got["TXN-001"]["dock"]["bay"] == 3
        assert got["TXN-001"]["price_per_unit"] == Decimal("4.25")
        assert got["TXN-001"]["total_cost"] == Decimal("512.13")
        assert got["TXN-002"]["services"] == ["refuel"]
        assert got["TXN-002"]["is_emergency"] is True
        assert got["TXN-001"]["arrival_date"] == dt.date(2025, 3, 1)

        # duplicate re-drop (same transaction_ids) → no new rows (S21)
        df.coalesce(1).write.mode("append").parquet(src)
        stream2 = spark.readStream.schema(FUEL_SALES_SCHEMA).parquet(src)
        q2 = file_watch_ingest(
            stream2, target, ckpt, keys=("transaction_id",),
            quarantine_dir=str(tmp_path / "bad"),
            valid_predicate=F.col("fuel_units") >= 0,
        )
        q2.awaitTermination()
        assert spark.read.parquet(target).count() == 2


class TestInferenceEdgeCase:
    def test_infer_misreads_mixed_column_explicit_schema_fixes(self, spark, tmp_path):
        # B12: elevation_ft has non-numeric rows → inference says string
        # (matching mini-lab-hdfs+spark-local/spark.ipynb's captured
        # printSchema); an explicit schema is the engine's fix.
        p = str(tmp_path / "airports.csv")
        with open(p, "w") as f:
            f.write("ident,name,elevation_ft\n")
            f.write("00A,Total Rf Heliport,11\n")
            f.write("00AK,Lowell Field,450\n")
            f.write("XXX,Broken Row,n/a\n")
        inferred = read_with_header(spark, p, infer=True)
        assert dict(inferred.dtypes)["elevation_ft"] == "string"

        explicit = read_with_header(
            spark,
            p,
            schema=T.StructType(
                [
                    T.StructField("ident", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("elevation_ft", T.IntegerType()),
                ]
            ),
        )
        rows = {r["ident"]: r["elevation_ft"] for r in explicit.collect()}
        assert rows["00A"] == 11
        assert rows["XXX"] is None  # unparseable → null, not job failure
