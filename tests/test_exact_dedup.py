"""Unit test for the exact-duplicate grouping operator (planted dups —
the testdata corpus has none)."""

from __future__ import annotations

from data_engineering_hs_spark.operators.dedup import exact_duplicates


class TestExactDuplicates:
    def test_planted_duplicates_group(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "The  quick brown fox"),
                (2, "the quick BROWN fox "),   # same after normalization
                (3, "completely different"),
                (4, "The quick brown fox"),    # same again
                (5, "also different"),
            ],
            ["doc_id", "text"],
        )
        groups = exact_duplicates(docs, "text", "doc_id").collect()
        assert len(groups) == 1
        assert groups[0]["n_docs"] == 3
        assert groups[0]["doc_ids"] == [1, 2, 4]

    def test_clean_corpus_yields_no_groups(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
        )
        assert exact_duplicates(docs, "text", "doc_id").count() == 0
