"""Scalar-function-surface queries (SURVEY.md §2.8 F1-F25).

Each query exercises a function family on the testdata tables with a
DuckDB oracle. Cross-engine determinism notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.functions.scalar import (
    md5_identity,
    month_bucket,
    norm_name,
)
from data_engineering_hs_spark.queries.registry import register


@register(
    "f_string_identity",
    oracle="""
SELECT c_custkey,
       lower(trim(c_name, ' ')) AS norm_name,
       upper(c_name) AS upper_name,
       md5(lower(trim(c_name, ' '))) AS name_md5,
       concat(c_mktsegment, ':', CAST(c_custkey AS VARCHAR)) AS seg_key,
       substring(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len
FROM customer
""",
    doc="string family: lower/trim/upper/md5/concat/substring/length "
    "(F1,F3-F5) — lab03 md5(lower(trim(name))) checksum idiom",
)
def f_string_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        norm_name("c_name").alias("norm_name"),
        F.upper("c_name").alias("upper_name"),
        md5_identity("c_name").alias("name_md5"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "f_initcap_fullname",
    oracle="""
SELECT s_suppkey,
       concat(
         upper(substring(lower(s_name), 1, 1)),
         substring(lower(s_name), 2)
       ) AS display_name
FROM supplier
""",
    doc="initcap/concat display-name (F2,F4) — dim_customers.sql:9 shape "
    "(single-word initcap spelled out so both engines agree)",
)
def f_initcap_fullname(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    low = F.lower(F.col("s_name"))
    return s.select(
        "s_suppkey",
        F.concat(F.upper(F.substring(low, 1, 1)), F.expr("substring(lower(s_name), 2)")).alias(
            "display_name"
        ),
    )


@register(
    "f_datetime_buckets",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month_bucket,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
       EXTRACT(year FROM o_orderdate) AS order_year,
       EXTRACT(dow FROM o_orderdate) AS dow_sunday0,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders WHERE o_orderkey <= 2000
""",
    doc="date family: to_date/yyyyMM bucket/trunc/extract/interval "
    "(F10-F14) — toYYYYMM + interval-30-day shapes",
)
def f_datetime_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        month_bucket("o_orderdate").alias("month_bucket"),
        F.date_format(F.trunc("o_orderdate", "quarter"), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
        F.year("o_orderdate").cast("long").alias("order_year"),
        # Spark dayofweek: 1=Sunday; DuckDB dow: 0=Sunday.
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sunday0"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@register(
    "f_epoch_millis",
    oracle="""
SELECT event_id,
       epoch_ms(ts) AS ts_millis,
       strftime(ts, '%Y-%m-%d %H:%M') AS iso_minute
FROM events WHERE event_id < 200
""",
    doc="epoch-millis ↔ timestamp + strptime-style formatting (F15,F16) — "
    "kafka ts:long convention",
)
def f_epoch_millis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") < 200).select(
        "event_id",
        F.unix_millis("ts").alias("ts_millis"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("iso_minute"),
    )


@register(
    "f_json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS n_missing
FROM events
GROUP BY event_type ORDER BY event_type
""",
    doc="JSON-string decode + aggregate (F22) — get_json_object over "
    "events.props, the from_json/jsonb capability",
)
def f_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.count(F.when(k.isNull(), 1)).alias("n_missing"),
        )
        .orderBy("event_type")
    )


@register(
    "f_split_explode_wordcount",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
GROUP BY word
""",
    doc="split + explode + group-count (F7,F8,A1) — the word-count shape "
    "from socket_streaming.py:17-18",
)
def f_split_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f_regexp_extract",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_type, '^([A-Z]+)', 1) AS type_family,
       regexp_extract(p_type, '([A-Z]+)$', 1) AS type_material,
       CASE WHEN regexp_matches(p_name, '^[aeiou]') THEN 1 ELSE 0 END AS starts_vowel
FROM part
""",
    doc="regex extract + match (P11,F9) — log error_type / filename "
    "extraction idiom",
)
def f_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_family"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_material"),
        F.when(F.col("p_name").rlike(r"^[aeiou]"), 1).otherwise(0).alias("starts_vowel"),
    )


@register(
    "f_numeric_family",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * (1 + l_tax) * 100) AS BIGINT) AS charge_cents,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
       CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_decile_hi,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem WHERE l_orderkey <= 1000
""",
    doc="numeric family: round/abs/floor/ceil/greatest/least + tax "
    "arithmetic (F18,F19,F21)",
)
def f_numeric_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 + F.col("l_tax")) * 100)
        .cast("long")
        .alias("charge_cents"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        F.ceil(F.col("l_quantity") / 10).cast("long").alias("qty_decile_hi"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "f_decimal_money",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
       CAST(CAST(round(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.07 AS DECIMAL(3,2)), 2)
            AS DECIMAL(18,2)) AS VARCHAR) AS tax_dec,
       CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) - CAST(100.50 AS DECIMAL(12,2))
            AS DECIMAL(18,2)) AS VARCHAR) AS less_deposit
FROM orders WHERE o_orderkey <= 1000
""",
    doc="decimal construct + arithmetic with pinned scales (F20) — "
    "toDecimal64 / Decimal-quantize fidelity",
)
def f_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Decimal arithmetic stays exact internally; outputs serialize to
    # strings because pandas/duckdb degrade Decimal to float64. The
    # explicit round-then-cast pins HALF_UP ties in both engines.
    price_dec = F.col("o_totalprice").cast("decimal(12,2)")
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        price_dec.cast("string").alias("price_dec"),
        F.round(price_dec * F.lit("0.07").cast("decimal(3,2)"), 2)
        .cast("decimal(18,2)")
        .cast("string")
        .alias("tax_dec"),
        (price_dec - F.lit("100.50").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .cast("string")
        .alias("less_deposit"),
    )


@register(
    "f_case_nullif",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag = 'R' THEN 'returned'
            WHEN l_linestatus = 'O' THEN 'open'
            ELSE 'closed' END AS status_label,
       nullif(l_discount, 0.0) AS discount_or_null,
       COALESCE(nullif(l_discount, 0.0), -1.0) AS discount_coalesced,
       (l_quantity > 25 AND l_discount > 0.02) AS is_bulk_discounted
FROM lineitem WHERE l_orderkey <= 1000
""",
    doc="case/when chains, nullif, coalesce, boolean columns "
    "(P3,P12,P13,F17,F24)",
)
def f_case_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return l.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_linestatus") == "O", "open")
        .otherwise("closed")
        .alias("status_label"),
        disc_null.alias("discount_or_null"),
        F.coalesce(disc_null, F.lit(-1.0)).alias("discount_coalesced"),
        ((F.col("l_quantity") > 25) & (F.col("l_discount") > 0.02)).alias(
            "is_bulk_discounted"
        ),
    )


@register(
    "f_unpivot_stack",
    oracle="""
SELECT c_custkey, metric, value FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
  FROM customer
) t
""",
    doc="unpivot (wide→long) via stack — the melt/UNPIVOT shape "
    "(set-op family extension)",
)
def f_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, "
            "'nationkey', cast(c_nationkey as double)) AS (metric, value)"
        ),
    )


@register(
    "f_array_ops",
    oracle="""
SELECT p_partkey,
       len(string_split(p_name, ' ')) AS n_words,
       list_contains(string_split(p_name, ' '), 'green') AS has_green,
       list_sort(string_split(p_name, ' '))[1] AS first_word_sorted,
       array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_joined
FROM part
""",
    doc="array family: size/contains/sort/join (F7 + array extensions)",
)
def f_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "green").alias("has_green"),
        F.array_sort(words).getItem(0).alias("first_word_sorted"),
        F.array_join(F.array_sort(words), "|").alias("sorted_joined"),
    )
