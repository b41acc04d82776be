"""Unicode / collation parity lens (r13): the oracle corpus is
ASCII-only, so a Java-vs-utf8proc or Java-vs-RE2 divergence in the
text operators could be driver-green today and silently wrong on the
multilingual corpora the LLM pipeline targets. Three kinds of pins:

1. Engine vs naive PYTHON mirrors (the independent third opinion) on
   a unicode-rich alphabet — Turkish İ/ı, ß/ẞ, final sigma, combining
   marks, NBSP/thin/ideographic spaces, CJK, Hebrew, an astral emoji,
   the fi-ligature, and the whole Java `\\s` class including \\x0B.
2. Spark-vs-DuckDB oracle-restatement parity on the SAFE alphabet
   (everything except the three code points where the engines
   legitimately diverge) — pins that the md5/token oracle forms stay
   exact on real non-ASCII text, not just ASCII.
3. The known divergences themselves, pinned deterministically so the
   documentation cannot rot: full-vs-simple case mapping (U+0130 İ,
   word-final Σ) and RE2's ASCII-minus-VT `\\s`. Plus a driver-corpus
   guard asserting the oracle-unsafe code points stay absent from the
   columns the md5 restatements hash.

Found and fixed by this lens (regression-pinned in
TestEdgeWhitespaceRegressions): tokens() kept the ''-segments of
edge-whitespace splits ('\\ta b\\n' counted 4 tokens, '\\n\\n' counted
2), inflating token_count and polluting shingles → MinHash; and
normalized_text trimmed BEFORE collapsing, so a trailing newline
changed a doc's fingerprint ('a\\n' → 'a ' vs 'a') and escaped exact
dedup.
"""

from __future__ import annotations

import re
import unicodedata

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Java \s — the engine's whitespace contract (ASCII only; includes
# \x0B, which RE2's \s does NOT).
JAVA_WS = " \t\n\x0b\f\r"

# The full battery: every class the probe found interesting.
UNI_ALPHABET = (
    "abYZ09.,!?-"
    + JAVA_WS
    + "  　"  # unicode spaces — NOT whitespace by contract
    + "ßẞüÜ"
    + "é"  # precomposed
    + "é"[1]  # combining acute (as its own char in the alphabet)
    + "中日"
    + "שד"
    + "\U0001f600"
    + "ﬃ"
    + "İıΣσς"
)

# SAFE alphabet for Spark↔DuckDB oracle parity: drop the three code
# points where the engines legitimately diverge — U+0130 (full
# lowercase i+U+0307 vs simple i), U+03A3 (context-sensitive final
# sigma vs unconditional σ), and \x0B (in Java's \s, not in RE2's).
ORACLE_SAFE_ALPHABET = (
    UNI_ALPHABET.replace("İ", "").replace("Σ", "").replace("\x0b", "")
)

uni_texts = st.lists(
    st.one_of(st.none(), st.text(alphabet=UNI_ALPHABET, max_size=24)),
    min_size=1,
    max_size=8,
)
safe_texts = st.lists(
    st.one_of(st.none(), st.text(alphabet=ORACLE_SAFE_ALPHABET, max_size=24)),
    min_size=1,
    max_size=8,
)


def _py_tokens(s):
    return [t for t in re.split("[" + JAVA_WS + "]+", s) if t]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# 1. Engine vs Python mirrors
# ---------------------------------------------------------------------------


@given(texts=uni_texts)
@FUZZ
def test_fuzz_tokens_and_norm_match_python(spark, texts):
    from data_engineering_hs_spark.functions.text import (
        normalized_text,
        token_count,
        tokens,
    )

    got = {
        r["doc_id"]: (r["t"], r["n"], r["norm"])
        for r in _df(spark, texts)
        .select(
            "doc_id",
            tokens("text").alias("t"),
            token_count("text").alias("n"),
            normalized_text("text").alias("norm"),
        )
        .collect()
    }
    for i, s in enumerate(texts):
        t, n, norm = got[i]
        if s is None:
            assert t is None and n is None and norm is None
            continue
        exp_toks = _py_tokens(s)
        assert t == exp_toks, (s, t)
        assert n == len(exp_toks), (s, n)
        # collapse-first-trim-last, Java-\s class, FULL-unicode lower
        # (Python str.lower is also full mapping — the third opinion)
        exp_norm = re.sub("[" + JAVA_WS + "]+", " ", s.lower()).strip(" ")
        assert norm == exp_norm, (s, norm, exp_norm)


@given(texts=uni_texts)
@FUZZ
def test_fuzz_quality_metrics_match_python(spark, texts):
    from data_engineering_hs_spark.functions.text import (
        STOPWORDS,
        mean_word_length,
        punct_ratio,
        stopword_ratio,
    )

    got = {
        r["doc_id"]: (r["pr"], r["sw"], r["mwl"])
        for r in _df(spark, texts)
        .select(
            "doc_id",
            punct_ratio("text").alias("pr"),
            stopword_ratio("text").alias("sw"),
            mean_word_length("text").alias("mwl"),
        )
        .collect()
    }
    for i, s in enumerate(texts):
        pr, sw, mwl = got[i]
        if s is None:
            assert pr is None and sw is None and mwl is None
            continue
        # \p{L}/\p{N} = Unicode letter/number categories; \s = Java ws
        n_punct = sum(
            1
            for ch in s
            if unicodedata.category(ch)[0] not in ("L", "N")
            and ch not in JAVA_WS
        )
        assert abs(pr - n_punct / max(len(s), 1)) < 1e-9, (s, pr)
        toks = _py_tokens(s)
        n_sw = sum(1 for t in toks if t.lower() in STOPWORDS)
        assert abs(sw - n_sw / max(len(toks), 1)) < 1e-9, (s, sw)
        total = sum(len(t) for t in toks)
        assert abs(mwl - total / max(len(toks), 1)) < 1e-9, (s, mwl)


@given(texts=uni_texts)
@FUZZ
def test_fuzz_lang_id_matches_python(spark, texts):
    from data_engineering_hs_spark.functions.text import lang_id

    markers = {
        "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
        "es": ["el", "la", "de", "que", "y", "los", "las", "por", "una", "es"],
        "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "zu"],
        "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "qui"],
    }

    def py_lang(s):
        toks = [t.lower() for t in _py_tokens(s)]
        scores = [
            (sum(1 for t in toks if t in ws), lang)
            for lang, ws in markers.items()
        ]
        scores.append(
            (sum(1 for ch in s if "一" <= ch <= "鿿"), "zh")
        )
        n, lang = max(scores)  # array_max: max n, then max lang code
        return lang if n > 0 else "und"

    got = {
        r["doc_id"]: r["lang"]
        for r in _df(spark, texts)
        .select("doc_id", lang_id("text").alias("lang"))
        .collect()
    }
    for i, s in enumerate(texts):
        if s is None:
            continue
        assert got[i] == py_lang(s), (s, got[i], py_lang(s))


@given(texts=uni_texts, n=st.sampled_from([2, 5]))
@FUZZ
def test_fuzz_char_ngrams_match_python_codepoints(spark, texts, n):
    # F.substring is CODE-POINT addressed (UTF8String), so the astral
    # emoji must count as one position, not a surrogate pair
    from data_engineering_hs_spark.functions.text import char_ngrams

    got = {
        r["doc_id"]: r["g"]
        for r in _df(spark, texts)
        .select("doc_id", char_ngrams("text", n).alias("g"))
        .collect()
    }
    for i, s in enumerate(texts):
        if s is None:
            continue
        if len(s) == 0:
            exp = []
        elif len(s) < n:
            exp = [s]
        else:
            seen = set()
            exp = []
            for j in range(len(s) - n + 1):
                g = s[j : j + n]
                if g not in seen:
                    seen.add(g)
                    exp.append(g)
        assert got[i] == exp, (s, n, got[i], exp)


# ---------------------------------------------------------------------------
# 2. Spark ↔ DuckDB oracle-restatement parity on the SAFE alphabet
# ---------------------------------------------------------------------------


@given(texts=safe_texts)
@FUZZ
def test_fuzz_oracle_restatements_agree_on_safe_unicode(spark, texts):
    """The md5(normalized) and token-count SQL forms the registry
    oracles use must agree with the engine beyond ASCII — this is the
    100-TB risk the round-12 verdict flagged. The safe alphabet still
    covers ß, ü, combining marks, CJK, Hebrew, emoji, ligatures, NBSP
    and all RE2-shared whitespace.

    This test found divergence #3 (now fixed across every oracle):
    DuckDB's one-arg trim strips UNICODE whitespace while Spark's
    trim strips only 0x20 — text like '\\u2009' normalized to ''
    oracle-side but survived engine-side. Every oracle now uses the
    two-arg trim(x, ' '), whose strip set matches Spark exactly."""
    from data_engineering_hs_spark.functions.text import (
        normalized_text,
        token_count,
    )

    got = (
        _df(spark, texts)
        .select(
            "doc_id",
            F.md5(normalized_text("text")).alias("h"),
            token_count("text").alias("n"),
            F.col("text").ilike("%aB%").alias("il"),
        )
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        s = texts[r["doc_id"]]
        dh, dn, dil = con.execute(
            """
            SELECT md5(trim(regexp_replace(lower($1), '\\s+', ' ', 'g'), ' ')),
                   len(list_filter(string_split_regex($1, '\\s+'),
                                   t_ -> t_ <> '')),
                   $1 ILIKE '%aB%'
            """,
            [s],
        ).fetchone()
        if s is None:
            assert r["h"] is None and r["n"] is None and r["il"] is None
            continue
        assert r["h"] == dh, (s, r["h"], dh)
        assert r["n"] == dn, (s, r["n"], dn)
        assert r["il"] == dil, (s, r["il"], dil)


# ---------------------------------------------------------------------------
# 3. Known divergences + corpus guard (deterministic)
# ---------------------------------------------------------------------------


class TestEdgeWhitespaceRegressions:
    """The two falsifying inputs this lens found, pinned exactly."""

    def test_edge_whitespace_does_not_inflate_tokens(self, spark):
        # before the fix: trim() strips only 0x20, Java split keeps
        # edge '' segments → '\ta b\n' tokenized ['', 'a', 'b', '']
        # (4 "tokens"), '\n\n' tokenized ['', ''] (2) — corpus-wide
        # token_count inflation and '' tokens inside MinHash shingles
        from data_engineering_hs_spark.functions.text import (
            token_count,
            tokens,
            word_shingle_seq,
        )

        rows = (
            spark.createDataFrame(
                [("\ta b\n",), ("\n\n",), ("\tx y z\n\n",)], "s string"
            )
            .select(
                tokens("s").alias("t"),
                token_count("s").alias("n"),
                word_shingle_seq("s", 3).alias("sh"),
            )
            .collect()
        )
        assert rows[0]["t"] == ["a", "b"] and rows[0]["n"] == 2
        assert rows[1]["t"] == [] and rows[1]["n"] == 0
        assert rows[2]["sh"] == ["x y z"]

    def test_trailing_newline_does_not_change_fingerprint(self, spark):
        # before the fix: normalized_text('a\n') == 'a ' != 'a' — two
        # byte-identical docs modulo a trailing newline got different
        # fingerprints and escaped exact dedup
        from data_engineering_hs_spark.functions.text import (
            fingerprint64,
            normalized_text,
        )

        rows = (
            spark.createDataFrame(
                [("doc one",), ("doc one\n",), ("\tdoc  ONE  ",)], "s string"
            )
            .select(
                normalized_text("s").alias("norm"),
                fingerprint64("s").alias("fp"),
            )
            .collect()
        )
        assert {r["norm"] for r in rows} == {"doc one"}
        assert len({r["fp"] for r in rows}) == 1


class TestPinnedDivergences:
    def test_full_vs_simple_case_mapping_still_diverges(self, spark):
        # Spark (Java, FULL mapping, agrees with Python) vs DuckDB
        # (utf8proc, SIMPLE mapping). If this ever starts passing as
        # equal, the ORACLE_SAFE_ALPHABET exclusions and the COVERAGE
        # note can be dropped.
        rows = spark.createDataFrame(
            [("İstanbul",), ("ΣΟΦΟΣ",)], "s string"
        ).select(F.lower("s").alias("l")).collect()
        spark_lower = [r["l"] for r in rows]
        assert spark_lower == ["İstanbul".lower(), "ΣΟΦΟΣ".lower()]  # = Python
        con = duckdb.connect()
        duck_lower = [
            con.execute("select lower($1)", [s]).fetchone()[0]
            for s in ("İstanbul", "ΣΟΦΟΣ")
        ]
        assert duck_lower == ["istanbul", "σοφοσ"]
        assert spark_lower != duck_lower

    def test_vertical_tab_whitespace_divergence(self, spark):
        # \x0B is whitespace to Java/Python, NOT to RE2 — the reason
        # it is excluded from the oracle-safe alphabet and guarded
        # out of the corpus below.
        got = (
            spark.createDataFrame([("a\x0bb",)], "s string")
            .select(F.regexp_replace("s", r"\s+", " ").alias("r"))
            .collect()[0]["r"]
        )
        assert got == "a b"
        duck = (
            duckdb.connect()
            .execute("select regexp_replace($1, '\\s+', ' ', 'g')", ["a\x0bb"])
            .fetchone()[0]
        )
        assert duck == "a\x0bb"

    def test_no_implicit_unicode_normalization(self, spark):
        # NFC 'é' and NFD 'é' are DIFFERENT strings everywhere
        # (equality is codepoint equality; nobody NFC-normalizes) —
        # the documented contract for dedup keys and dbt-style
        # accepted_values checks on multilingual corpora.
        nfc, nfd = "café", "café"
        assert nfc != nfd
        r = (
            spark.createDataFrame([(nfc, nfd)], "a string, b string")
            .select(
                (F.col("a") == F.col("b")).alias("eq"),
                (F.xxhash64("a") == F.xxhash64("b")).alias("heq"),
            )
            .collect()[0]
        )
        assert r["eq"] is False and r["heq"] is False
        assert (
            duckdb.connect().execute("select $1 = $2", [nfc, nfd]).fetchone()[0]
            is False
        )

    def test_letter_category_skew_absent_from_driver_corpus(self, spark):
        # r14 category-skew scan: Java's regex Unicode tables lag
        # RE2/utf8proc's, so some codepoints (e.g. the U+0870.. Arabic
        # letters added in newer Unicode) are \p{L} in DuckDB but NOT
        # in Spark's Java regex — punct_ratio (and through it
        # quality_score and the curate pipeline) classifies them
        # oppositely between engine and oracle. Re-derive the
        # divergent set from the LIVE engines (version-proof: a JVM
        # or DuckDB upgrade updates it automatically), document that
        # the class exists, and assert the driver corpus contains
        # none of them — the same guard posture as the three
        # case-mapping codepoints below.
        import duckdb
        import pandas as pd
        import unicodedata

        cps = [
            cp
            for cp in range(0x20, 0x10000)
            if not (0xD800 <= cp <= 0xDFFF)
        ]
        df = spark.createDataFrame(
            [(cp, chr(cp)) for cp in cps], "cp long, ch string"
        )
        java_content = {
            r["cp"]: r["keep"]
            for r in df.select(
                "cp",
                (
                    F.length(
                        F.regexp_replace("ch", r"[\p{L}\p{N}\s]", "")
                    )
                    == 0
                ).alias("keep"),
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "cps_t", pd.DataFrame({"cp": cps, "ch": [chr(c) for c in cps]})
        )
        re2_content = dict(
            con.execute(
                "SELECT cp, length(regexp_replace(ch,"
                " '[\\p{L}\\p{N}\\s]', '', 'g')) = 0 FROM cps_t"
            ).fetchall()
        )
        skew = sorted(cp for cp in cps if java_content[cp] != re2_content[cp])
        # the class is real (56 codepoints on the pinning JVM) and is
        # pure table-version skew: every divergent cp is a letter or
        # number per Python's (recent) Unicode data
        assert skew, "category skew vanished — update the guard's rationale"
        assert all(
            unicodedata.category(chr(cp))[0] in ("L", "N") for cp in skew
        ), [hex(c) for c in skew if unicodedata.category(chr(c))[0] not in ("L", "N")][:5]
        # driver corpus must not contain any of them (else punct_ratio
        # oracles mismatch): check the text columns the oracles hash
        skew_chars = "".join(chr(c) for c in skew)
        for sf in ("0.001", "0.01", "0.1"):
            for table, col in (("documents", "text"), ("customer", "c_name")):
                path = f"/root/testdata/sf{sf}/{table}.parquet"
                n = con.execute(
                    f"""SELECT count(*) FROM '{path}'
                        WHERE length(regexp_replace({col},
                          '[^' || $1 || ']', '', 'g')) > 0""",
                    [skew_chars],
                ).fetchone()[0]
                assert n == 0, (sf, table, n)

    def test_driver_corpus_stays_oracle_safe(self):
        # The md5/token oracle restatements are exact only without
        # the three divergent code points; assert the columns they
        # hash stay clean so a future testdata regeneration that
        # breaks the assumption fails HERE, not as an inscrutable
        # driver hash mismatch.
        con = duckdb.connect()
        for sf in ("0.001", "0.01", "0.1"):
            for table, col in (("documents", "text"), ("customer", "c_name")):
                path = f"/root/testdata/sf{sf}/{table}.parquet"
                n = con.execute(
                    f"""select count(*) from '{path}' where
                        contains({col}, chr(304)) or contains({col}, chr(931))
                        or contains({col}, chr(11))"""
                ).fetchone()[0]
                assert n == 0, (sf, table, n)
