"""Interleaved A/B for the r16 bind_once sweep beyond the shingle
path: segment_dedup (tokens re-split per SEGMENT per row), lang_id
(re-split per language marker set), quality_score (3 splits → 1),
stopword_ratio / mean_word_length (2 → 1).

A = the OLD multi-reference forms (reconstructed inline below),
B = the shipped bind_once forms. Strictly interleaved in one session
on t_segment_dedup / t_langid / t_quality_score at sf0.1; value
identity asserted at sf0.01 first.

Usage: python scripts_ab_bind_once.py [reps=5]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_engineering_hs_spark.functions import text as TX
from data_engineering_hs_spark.operators import corpus as C
from data_engineering_hs_spark.session import get_spark

NEW = {
    "stopword_ratio": TX.stopword_ratio,
    "mean_word_length": TX.mean_word_length,
    "quality_score": TX.quality_score,
    "lang_id": TX.lang_id,
    "segment_dedup": C.segment_dedup,
}


# ---- old forms (pre-bind_once), reconstructed verbatim ----------------

def _old_stopword_ratio(c) -> Column:
    toks = TX.tokens(c)
    sw = F.array([F.lit(w) for w in TX.STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return n_sw.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def _old_mean_word_length(c) -> Column:
    toks = TX.tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def _old_quality_score(c) -> Column:
    from data_engineering_hs_spark.functions.scalar import stable_round

    n_tok = TX.token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(TX.punct_ratio(c) * 5.0, F.lit(1.0))
    sw = _old_stopword_ratio(c)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.25)) * 2.0
    return stable_round(
        (len_score + punct_score + F.greatest(sw_score, F.lit(0.0))) / 3.0, 6
    )


def _old_lang_id(c) -> Column:
    from data_engineering_hs_spark.functions.scalar import _col

    toks = F.transform(TX.tokens(c), F.lower)

    def marker_count(words):
        arr = F.array([F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    en = marker_count(["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"])
    es = marker_count(["el", "la", "de", "que", "y", "los", "las", "por", "una", "es"])
    de = marker_count(["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "zu"])
    fr = marker_count(["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "qui"])
    zh = F.size(F.regexp_extract_all(_col(c), F.lit(r"[一-鿿]"), 0))
    scores = F.array(
        F.struct(en.alias("n"), F.lit("en").alias("lang")),
        F.struct(es.alias("n"), F.lit("es").alias("lang")),
        F.struct(de.alias("n"), F.lit("de").alias("lang")),
        F.struct(fr.alias("n"), F.lit("fr").alias("lang")),
        F.struct(zh.alias("n"), F.lit("zh").alias("lang")),
    )
    best = F.array_max(scores)
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def _old_segment_dedup(df, text_col, id_col, seg_tokens: int = 10):
    from pyspark.sql import Window

    toks = TX.tokens(F.col(text_col))
    n_segs = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(1), F.greatest(n_segs, F.lit(1))),
        lambda i: F.struct(
            i.alias("seg_idx"),
            F.concat_ws(
                " ", F.slice(toks, (i - F.lit(1)) * seg_tokens + 1, seg_tokens)
            ).alias("seg"),
        ),
    )
    exploded = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(segs).alias("s"))
        .select("doc_id", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
        .filter(F.col("seg") != "")
    )
    w = Window.partitionBy("seg")
    winner = exploded.withColumn(
        "__win", F.min(F.struct("doc_id", "seg_idx")).over(w)
    ).withColumn(
        "kept",
        (F.col("doc_id") == F.col("__win.doc_id"))
        & (F.col("seg_idx") == F.col("__win.seg_idx")),
    )
    kept_in_order = F.transform(
        F.array_sort(
            F.collect_list(F.when(F.col("kept"), F.struct("seg_idx", "seg")))
        ),
        lambda s: s["seg"],
    )
    return (
        winner.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.concat_ws(" ", kept_in_order).alias("dedup_text"),
        )
    )


OLD = {
    "stopword_ratio": _old_stopword_ratio,
    "mean_word_length": _old_mean_word_length,
    "quality_score": _old_quality_score,
    "lang_id": _old_lang_id,
    "segment_dedup": _old_segment_dedup,
}


def set_impl(impls) -> None:
    for name, fn in impls.items():
        setattr(TX, name, fn)
    C.segment_dedup = impls["segment_dedup"]
    # queries modules bind operators via module attribute access
    # (C.segment_dedup / TX.lang_id at call time), so this suffices


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qnames = ["t_segment_dedup", "t_langid", "t_quality_score"]
    qs = {n: entry.queries()[n] for n in qnames}

    # value identity at sf0.01
    for n, q in qs.items():
        set_impl(NEW)
        new_rows = sorted(map(tuple, q(spark, "/root/testdata/sf0.01").collect()))
        set_impl(OLD)
        old_rows = sorted(map(tuple, q(spark, "/root/testdata/sf0.01").collect()))
        assert new_rows == old_rows, f"VALUE DIVERGENCE in {n}"
        print(f"value identity OK: {n} ({len(new_rows)} rows)")

    sf = "/root/testdata/sf0.1"

    def run(q) -> float:
        t0 = time.perf_counter()
        q(spark, sf).count()
        return time.perf_counter() - t0

    for n, q in qs.items():
        set_impl(OLD); run(q)
        set_impl(NEW); run(q)  # warmups
        a, b = [], []
        for _ in range(reps):
            set_impl(OLD)
            a.append(run(q))
            set_impl(NEW)
            b.append(run(q))
        ma, mb = statistics.median(a), statistics.median(b)
        print(
            f"{n}: OLD={[round(t,3) for t in a]} median={ma:.3f}s | "
            f"NEW={[round(t,3) for t in b]} median={mb:.3f}s | "
            f"delta {100*(mb-ma)/ma:+.1f}%"
        )
    set_impl(NEW)


if __name__ == "__main__":
    main()
