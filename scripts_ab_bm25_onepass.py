"""Interleaved A/B of the r16 one-pass _bm25_scored restructure.

A = the pre-r16 four-pass shape (tf / df-from-tf / dl / stats each
re-scanning + re-tokenizing the corpus), reproduced inline below.
B = the shipped one-pass shape (reduced-proxy localCheckpoint,
df via window) — data_engineering_hs_spark.queries.llm2._bm25_scored.

Asserts full-frame value identity FIRST, then times s_bm25_topk's
whole pipeline (score + order + limit + count) A B A B ... in one
session. Usage: python scripts_ab_bm25_onepass.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_hs_spark.catalog import load_table
from data_engineering_hs_spark.functions.scalar import stable_round
from data_engineering_hs_spark.functions.text import tokens
from data_engineering_hs_spark.queries.llm2 import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BM25_TOPK,
    _bm25_scored,
)
from data_engineering_hs_spark.session import get_spark


def bm25_four_pass(d: DataFrame) -> DataFrame:
    """The pre-r16 shape, verbatim."""
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    terms = F.array(*[F.lit(t) for t in _BM25_TERMS])
    tf = (
        toks.select(
            "doc_id",
            F.explode(F.filter("t", lambda x: F.array_contains(terms, x))).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    dl = toks.select("doc_id", F.size("t").alias("dl"))
    stats = toks.agg(F.count("*").alias("n_docs"), F.avg(F.size("t")).alias("avgdl"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    k1, b = _BM25_K1, _BM25_B
    contrib = idf * F.col("tf") * (k1 + 1.0) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_term = [
        F.sum(F.when(F.col("term") == t, contrib).otherwise(F.lit(0.0))).alias(
            f"__s{i}"
        )
        for i, t in enumerate(_BM25_TERMS)
    ]
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(*per_term)
    )
    total = None
    for i in range(len(_BM25_TERMS)):
        c = F.col(f"__s{i}")
        total = c if total is None else total + c
    return scored.select(
        "doc_id", stable_round(total.alias("score"), 4).alias("bm25")
    )


reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_bm25_onepass")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

d = load_table(spark, sf_dir, "documents")
old_rows = sorted(map(tuple, bm25_four_pass(d).collect()))
new_rows = sorted(map(tuple, _bm25_scored(d).collect()))
assert old_rows == new_rows, (
    f"value mismatch: {len(old_rows)} vs {len(new_rows)} rows"
)
print(f"values identical ({len(old_rows)} scored docs)", flush=True)


def run(fn) -> float:
    t0 = time.perf_counter()
    fn(d).orderBy(F.desc("bm25"), "doc_id").limit(_BM25_TOPK).count()
    return time.perf_counter() - t0


run(bm25_four_pass)
run(_bm25_scored)  # warm both plans
a, b_ = [], []
for _ in range(reps):
    a.append(run(bm25_four_pass))
    b_.append(run(_bm25_scored))
med = lambda xs: sorted(xs)[len(xs) // 2]
ma, mb = med(a), med(b_)
print(f"four-pass {ma:.3f}s one-pass {mb:.3f}s ({100 * (mb / ma - 1):+.1f}%)")
