"""Curated expression library (JVM-side, codegen-friendly).

Everything here returns pyspark Columns built from
``pyspark.sql.functions`` — no Python row UDFs. This is the engine's
scalar-function surface (SURVEY.md §2.8 F1-F25) plus text-analytics
and vector math extensions for LLM-pipeline workloads.
"""

from data_engineering_hs_spark.functions import scalar, text, vector  # noqa: F401
