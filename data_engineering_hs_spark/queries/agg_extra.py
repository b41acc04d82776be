"""Aggregation-surface extras: ordered string aggregation, exact
statistical moments, ratio-to-report."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.functions.scalar import money_cents
from data_engineering_hs_spark.queries.registry import register


@register(
    "a_string_agg",
    oracle="""
SELECT c_mktsegment,
       string_agg(substring(c_name, 1, 12), ',' ORDER BY c_name) AS names_joined,
       COUNT(*) AS n
FROM customer WHERE c_custkey <= 60
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    doc="ordered string aggregation (LISTAGG/string_agg) — "
    "collect_list + array_sort + array_join in Spark",
)
def a_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") <= 60)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.substring("c_name", 1, 12))), ","
            ).alias("names_joined"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "a_stats_moments",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(c) AS DOUBLE) / COUNT(*) / 100.0 AS mean_price,
       (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(c2) AS DOUBLE)
        - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
       / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0))
       / 10000.0 AS var_price
FROM (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_extendedprice * 100) AS BIGINT) AS c2
  FROM lineitem
) GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="statistical moments (mean/sample variance) from EXACT integer "
    "sum/sum-of-squares — deterministic across engines and "
    "partitionings, unlike builtin stddev's streaming formulas",
)
def a_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    c = money_cents("l_extendedprice")
    base = l.select("l_returnflag", c.alias("c"), (c * c).alias("c2"))
    n = F.count("*").cast("double")
    s = F.sum("c").cast("double")
    s2 = F.sum("c2").cast("double")
    return (
        base.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            (s / n / 100.0).alias("mean_price"),
            ((n * s2 - s * s) / (n * (n - 1.0)) / 10000.0).alias("var_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "f_from_json_struct",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
       (CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL)
         AS has_k
FROM events WHERE event_id < 300
""",
    doc="typed from_json decode into a struct column + field access "
    "(S16 full parity — the schema-enforced path next to "
    "get_json_object's stringly one)",
)
def f_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.filter(F.col("event_id") < 300).withColumn(
        "data", F.from_json("props", schema)
    )
    return parsed.select(
        "event_id",
        F.col("data.k").alias("k_typed"),
        F.col("data.k").isNotNull().alias("has_k"),
    )


@register(
    "a_bool_aggs",
    oracle="""
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    doc="boolean aggregate family: count_if / bool_and (every) / "
    "bool_or (any)",
)
def a_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "j_argmin_join_back",
    oracle="""
WITH mins AS (
  SELECT l_partkey, MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_cents
  FROM lineitem GROUP BY l_partkey
)
SELECT l.l_partkey, m.min_cents,
       MIN(l.l_suppkey) AS cheapest_suppkey
FROM lineitem l
JOIN mins m ON l.l_partkey = m.l_partkey
           AND CAST(round(l.l_extendedprice * 100) AS BIGINT) = m.min_cents
GROUP BY l.l_partkey, m.min_cents
""",
    doc="argmin join-back (TPC-H Q2 / correlated MIN subquery shape): "
    "per-group minimum computed once, joined back to recover the "
    "row(s) attaining it, deterministic tie-break",
)
def j_argmin_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    cents = money_cents("l_extendedprice")
    base = l.select("l_partkey", "l_suppkey", cents.alias("cents")).alias("b")
    mins = (
        l.select("l_partkey", cents.alias("cents"))
        .groupBy("l_partkey")
        .agg(F.min("cents").alias("min_cents"))
        .withColumnRenamed("l_partkey", "m_partkey")
    )
    return (
        base.join(
            mins,
            (F.col("b.l_partkey") == F.col("m_partkey"))
            & (F.col("b.cents") == F.col("min_cents")),
        )
        .groupBy(F.col("b.l_partkey").alias("l_partkey"), "min_cents")
        .agg(F.min("l_suppkey").alias("cheapest_suppkey"))
    )


@register(
    "o_date_spine",
    # bounds truncate to MONTH START before stepping: Spark's
    # sequence() computes lo + i*INTERVAL while DuckDB's
    # generate_series iterates with a sticky end-of-month clamp, so a
    # lo day-of-month >= 29 makes the engines generate DIFFERENT
    # month counts near hi (verified: from Jan 31, Spark stops at
    # Feb 28 where DuckDB continues to Mar 28). Month-start steps are
    # identical in both.
    oracle="""
WITH bounds AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
  FROM orders WHERE o_custkey = 1
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month_start
  FROM bounds
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_custkey = 1
  GROUP BY 1
)
SELECT strftime(s.month_start, '%Y-%m-%d') AS month_start,
       CAST(COALESCE(m.cents, 0) AS BIGINT) AS cents
FROM spine s
LEFT JOIN monthly m ON s.month_start = m.month_start
ORDER BY 1
""",
    doc="date-spine gap fill: generate a continuous month sequence "
    "(F.sequence + explode) and left-join sparse facts so empty "
    "periods report zero — the BI calendar-spine operator",
)
def o_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") == 1)
    bounds = o.agg(
        F.trunc(F.min(F.to_date("o_orderdate")), "month").alias("lo"),
        F.trunc(F.max(F.to_date("o_orderdate")), "month").alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month_start")
    )
    monthly = o.groupBy(
        F.trunc("o_orderdate", "month").alias("month_start")
    ).agg(F.sum(money_cents("o_totalprice")).alias("cents"))
    # 1:1 left join (spine and monthly are both month-unique) — no
    # re-aggregation needed
    return (
        spine.join(monthly, "month_start", "left")
        .select(
            F.date_format("month_start", "yyyy-MM-dd").alias("month_start"),
            F.coalesce("cents", F.lit(0)).cast("long").alias("cents"),
        )
        .orderBy("month_start")
    )


@register(
    "u_union_schema_evolution",
    oracle="""
SELECT c_custkey, c_name, c_acctbal, src FROM (
  SELECT c_custkey, c_name, c_acctbal, 'full' AS src
  FROM customer WHERE c_custkey <= 20
  UNION ALL
  SELECT c_custkey, c_name, NULL AS c_acctbal, 'slim' AS src
  FROM customer WHERE c_custkey > 130
) t
""",
    doc="schema-evolution union: unionByName(allowMissingColumns) fills "
    "absent columns with NULL — the multi-vintage ingestion shape",
)
def u_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    full = c.filter(F.col("c_custkey") <= 20).select(
        "c_custkey", "c_name", "c_acctbal", F.lit("full").alias("src")
    )
    slim = c.filter(F.col("c_custkey") > 130).select(
        "c_custkey", "c_name", F.lit("slim").alias("src")
    )
    return full.unionByName(slim, allowMissingColumns=True)


@register(
    "f_date_arithmetic",
    oracle="""
SELECT o_orderkey,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE),
                '%Y-%m-%d') AS plus_3_months,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(date_diff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS whole_months_since_95
FROM orders WHERE o_orderkey <= 1000
""",
    doc="date arithmetic family: datediff, add_months, last_day, "
    "whole-month difference (F11/F14 depth)",
)
def f_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    epoch95 = F.lit("1995-01-01").cast("date")
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.datediff(d, epoch95).alias("days_since_95"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        # DuckDB's month date_diff counts month-boundary crossings.
        (
            (F.year(d) - F.lit(1995)) * 12 + (F.month(d) - F.lit(1))
        ).cast("long").alias("whole_months_since_95"),
    )


@register(
    "w_share_of_total",
    oracle="""
WITH agg AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER () AS DOUBLE) AS share
FROM agg ORDER BY o_orderpriority
""",
    doc="ratio-to-report: per-group share of the grand total via an "
    "empty-over window (exact cents → deterministic division)",
)
def w_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.sum(money_cents("o_totalprice")).alias("cents")
    )
    w = Window.partitionBy()
    return agg.select(
        "o_orderpriority",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (
            F.col("cents").cast("double") / F.sum("cents").over(w).cast("double")
        ).alias("share"),
    ).orderBy("o_orderpriority")


@register(
    "a_rolling_distinct_hll",
    # Rolling 7-day distinct users, twice: exactly (day-range join +
    # distinct — what the oracle restates) and via MERGEABLE daily
    # HLL sketches (hll_sketch_agg per day once, hll_union_agg over
    # each 7-day window). The sketch path is the 100-TB shape — raw
    # events are scanned once per day ever, windows merge byte-sized
    # sketches — and its estimate rides along as a hash-safe audit
    # boolean (within 5% of exact; lgConfigK=12 keeps worst-case
    # error ~1.6%). The exact columns hash-check; a sketch-path
    # regression flips est_ok red.
    oracle="""
WITH days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
), ex AS (
  SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_users
  FROM days d
  JOIN (SELECT CAST(ts AS DATE) AS eday, user_id FROM events) e
    ON e.eday BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT CAST(day AS VARCHAR) AS day, exact_users, TRUE AS est_ok
FROM ex ORDER BY day
""",
    doc="rolling 7-day distinct users: exact (day-range join) AND "
    "merged daily HLL sketches — the mergeable-sketch scale path "
    "audited against the exact count (estimate within 5% as data)",
)
def a_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: F401  (day-join form used)

    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    days = daily.select(F.col("day").alias("d"))
    # day-range join: the "window" side is the tiny day list, the
    # sketch side is one row per day — both engines see the same
    # exact counts; the sketch union is Spark-only and lands in the
    # audit boolean
    merged = (
        days.join(
            daily,
            (F.col("day") >= F.date_sub(F.col("d"), 6))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
    )
    exact = (
        days.join(
            e, (e.day >= F.date_sub(F.col("d"), 6)) & (e.day <= F.col("d"))
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return (
        exact.join(merged, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                * 100 <= F.col("exact_users") * 5
            ).alias("est_ok"),
        )
        .orderBy("day")
    )


@register(
    "a_heavy_hitters_cms",
    # Count-min sketch heavy hitters, audited: the top-20 keys by
    # EXACT count (deterministic tie order: count desc, key asc)
    # carry their exact counts through the hash plus two booleans
    # the sketch GUARANTEES — over_ok (estimate >= exact, always:
    # collisions only add) and bound_ok (overestimate <= 8N/width, a
    # generous multiple of the expected N/width collision mass,
    # deterministic for fixed data + xxhash). The sketch itself is
    # engine-specific (hash family) and can't cross engines — the
    # audit-boolean pattern, same as a_rolling_distinct_hll.
    oracle="""
SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
       TRUE AS over_ok, TRUE AS bound_ok
FROM lineitem GROUP BY l_suppkey
ORDER BY exact_cnt DESC, suppkey LIMIT 20
""",
    doc="count-min sketch frequency estimates audited against the "
    "exact top-20 key counts: one-pass fixed-size mergeable summary "
    "(depth 4 x width 8192 cells) — the point-frequency twin of the "
    "HLL distinct path; overestimate + error-bound guarantees "
    "emitted as data",
)
def a_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_hs_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    depth, width = 4, 8192
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey")
    )
    sketch = cms_build(li, "suppkey", depth=depth, width=width)
    exact = (
        li.groupBy("suppkey")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "suppkey")
        .limit(20)
        # referenced twice (probe keys + final join): checkpoint the
        # 20-row frame so the full groupBy+sort doesn't run twice
        .localCheckpoint(eager=True)
    )
    est = cms_estimate(sketch, exact, "suppkey", depth=depth, width=width)
    n_total = li.agg(F.count("*").alias("__n"))
    return (
        exact.join(est, "suppkey")
        .crossJoin(F.broadcast(n_total))
        .select(
            "suppkey",
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).alias("over_ok"),
            (
                F.col("est") - F.col("exact_cnt")
                <= F.lit(8) * F.col("__n") / F.lit(width)
            ).alias("bound_ok"),
        )
        .orderBy(F.desc("exact_cnt"), "suppkey")
    )


@register(
    "a_distinct_overlap_hll",
    # Sketch SET ALGEBRA: HLL unions compose natively, intersections
    # don't — the standard scale answer is inclusion-exclusion over
    # mergeable sketches, est(A∩B) = est(A) + est(B) − est(A∪B).
    # Demonstrated on a genuine partial overlap (customers ordering
    # in 1996 vs 1997: ~926 of 1419 union members at sf0.01) with the
    # exact counts carried through the hash and the estimate audited
    # within 5% of the union + 2 absolute — inclusion-exclusion
    # compounds three sketch errors, so the bound is on the UNION
    # size, the quantity that scales the absolute error. The exact
    # intersection requires co-locating both sides (a distinct join);
    # the sketch path answers from kilobytes per shard — the 100-TB
    # shape when A and B live on different clusters or days.
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE year(o_orderdate) = 1996),
     b AS (SELECT DISTINCT o_custkey FROM orders
           WHERE year(o_orderdate) = 1997)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM a JOIN b USING (o_custkey)) AS n_overlap,
       TRUE AS est_ok
""",
    doc="distinct-customer overlap between two order years: exact "
    "(distinct join) AND HLL inclusion-exclusion over mergeable "
    "sketches — sketch set algebra audited against truth",
)
def a_distinct_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"), "o_custkey"
    )
    a = o.filter(F.col("y") == 1996).select("o_custkey")
    b = o.filter(F.col("y") == 1997).select("o_custkey")
    exact = (
        a.agg(F.count_distinct("o_custkey").alias("n_a"))
        .crossJoin(b.agg(F.count_distinct("o_custkey").alias("n_b")))
        .crossJoin(
            a.distinct()
            .join(b.distinct(), "o_custkey")
            .agg(F.count("*").alias("n_overlap"))
        )
    )
    sk = (
        a.agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("ska"))
        .crossJoin(b.agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("skb")))
        .select(
            F.hll_sketch_estimate("ska").alias("ea"),
            F.hll_sketch_estimate("skb").alias("eb"),
            F.hll_sketch_estimate(
                F.hll_union("ska", "skb")
            ).alias("eu"),
        )
        .select((F.col("ea") + F.col("eb") - F.col("eu")).alias("est_overlap"))
    )
    return (
        exact.crossJoin(F.broadcast(sk))
        .select(
            "n_a",
            "n_b",
            "n_overlap",
            (
                F.abs(F.col("est_overlap") - F.col("n_overlap")) * 20
                <= (F.col("n_a") + F.col("n_b") - F.col("n_overlap")) + 40
            ).alias("est_ok"),
        )
    )


@register(
    "a_funnel_steps",
    # Ordered-funnel analysis (view -> click -> purchase): a user
    # counts for step k only with an event strictly AFTER their
    # step-(k-1) time — the sequential dependency is resolved by
    # per-step conditional min-ts aggregations chained on the user
    # key (after the first shuffle the frames are co-partitioned, so
    # the chain costs one real exchange). Microsecond event
    # timestamps make strict '>' unambiguous; counts and integer-ppm
    # conversion rates cross engines exactly.
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click_after_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase_after_click,
       CAST(FLOOR(1e6 * (SELECT COUNT(*) FROM s3)
                  / (SELECT COUNT(*) FROM s1)) AS BIGINT)
         AS conversion_ppm
""",
    doc="ordered funnel view -> click -> purchase with strict "
    "temporal sequencing (each step strictly after the user's "
    "previous step): per-step user counts + end-to-end conversion "
    "in integer ppm",
)
def a_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_view"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchase_after_click")))
        .select(
            "n_view",
            "n_click_after_view",
            "n_purchase_after_click",
            F.floor(
                F.lit(1_000_000)
                * F.col("n_purchase_after_click")
                / F.col("n_view")
            )
            .cast("long")
            .alias("conversion_ppm"),
        )
    )
