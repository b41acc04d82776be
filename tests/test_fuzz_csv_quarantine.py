"""Conservation fuzz for sources.csv.read_with_quarantine (r15, the
round's new surface): hypothesis-generated dirty CSVs vs a naive
Python mirror of Spark's PERMISSIVE semantics.

The law under test: for files without quote damage or embedded
newlines, (clean, quarantine) PARTITIONS the data lines — every
non-empty line lands in exactly one frame, quarantined lines carry
their raw text verbatim, and the clean set is exactly the lines with
correct arity whose typed fields parse. A row silently dropped from
both frames (or duplicated into both) is data loss/duplication at
100 TB; this is the contract the lens pins by example and this fuzz
pins in bulk.

Mirror rules (probed live, tests/test_csv_malformed_parity.py and
the r15 probe session):
- an EMPTY line is skipped by the reader entirely (neither frame);
- arity != schema width → quarantine (short rows are null-padded,
  long rows keep the parsed prefix — both flagged);
- BIGINT parse: optional sign + digits, int64 range, NO trimming
  (' 5' and '5 ' are corrupt) — empty string is null, not corrupt;
- DOUBLE parse: Java-style decimal/scientific literals ('Infinity'
  yes, 'inf' no — generators avoid those tokens entirely);
- a type-failed field nulls only itself and flags the row.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_engineering_hs_spark.sources.csv import (
    CORRUPT_COL,
    read_with_quarantine,
)

FUZZ = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),
    ]
)

_I64 = 2**63

# field generators: every token's Spark parse is mirrorable exactly.
# alpha tokens use a consonant-only alphabet so they can never spell
# nan/infinity (valid doubles) and never carry Java float suffixes
# on digits (pure alpha is always invalid for both numeric types).
_alpha = st.text(alphabet="bghjkmpqrw", min_size=1, max_size=6)
_int_tok = st.integers(
    min_value=-(2**70), max_value=2**70
).map(str)  # beyond-int64 values exercise the overflow→corrupt path
_float_tok = st.builds(
    lambda m, e: f"{m}e{e}" if e is not None else m,
    st.builds(
        lambda s, i, f: f"{s}{i}.{f}" if f is not None else f"{s}{i}",
        st.sampled_from(["", "-", "+"]),
        st.integers(min_value=0, max_value=10**6).map(str),
        st.one_of(
            st.none(), st.integers(min_value=0, max_value=10**6).map(str)
        ),
    ),
    st.one_of(st.none(), st.integers(min_value=-30, max_value=30)),
)
_field = st.one_of(st.just(""), _alpha, _int_tok, _float_tok)
_line = st.lists(_field, min_size=1, max_size=5).map(",".join)

_INT_RE = re.compile(r"^[+-]?\d+$")
# Java Double.parseDouble grammar, restricted to what the generators
# can emit (decimal digits, optional point/exponent/sign)
_DBL_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def _parse_long(s: str):
    """(ok, value): Spark's BIGINT field parse — None for empty."""
    if s == "":
        return True, None
    if not _INT_RE.match(s):
        return False, None
    v = int(s)
    if not (-_I64 <= v < _I64):
        return False, None
    return True, v


def _parse_double(s: str):
    if s == "":
        return True, None
    if not _DBL_RE.match(s):
        return False, None
    return True, float(s)


def _mirror(lines: list[str]):
    """Naive Python mirror → (clean rows, quarantine raw lines)."""
    clean, quar = [], []
    for line in lines:
        if line == "":
            continue  # the reader skips truly empty lines
        fields = line.split(",")
        if len(fields) != 3:
            quar.append(line)
            continue
        ok_a, va = _parse_long(fields[0])
        ok_c, vc = _parse_double(fields[2])
        vb = fields[1] if fields[1] != "" else None
        if ok_a and ok_c:
            clean.append((va, vb, vc))
        else:
            quar.append(line)
    return clean, quar


class TestQuarantineConservation:
    @given(lines=st.lists(_line, min_size=1, max_size=12))
    @FUZZ
    def test_partition_law_vs_naive_mirror(self, spark, lines, tmp_path_factory):
        p = str(tmp_path_factory.mktemp("fz") / "f.csv")
        with open(p, "w") as fh:
            fh.write("a,b,c\n")
            for line in lines:
                fh.write(line + "\n")
        clean_df, quar_df = read_with_quarantine(spark, p, SCHEMA)
        got_clean = sorted(
            (tuple(r) for r in clean_df.collect()), key=str
        )
        got_quar = sorted(r[CORRUPT_COL] for r in quar_df.collect())
        want_clean, want_quar = _mirror(lines)
        assert got_quar == sorted(want_quar), (
            "quarantine raw lines diverge from the mirror"
        )
        assert got_clean == sorted(want_clean, key=str), (
            "clean rows diverge from the mirror"
        )
        # conservation: nothing dropped, nothing duplicated
        n_lines = sum(1 for line in lines if line != "")
        assert len(got_clean) + len(got_quar) == n_lines
