"""Scale-invariance pin for the curation pipeline (r14, sanctioned).

Round 13 found t_curate_training_set semantically degenerate at 10×
scale: the boilerplate stage's ABSOLUTE min_docs=5 threshold
classified nearly every 3-shingle of the 10× corpus as common (mean
ratio 0.028 → 0.983), the ≤0.8 ceiling rejected everything, and the
pipeline selected 0/4992 docs at sf0.1 — driver-green (the oracle
restated the same policy) but an empty training set at 100 TB.

The r14 fix makes the threshold FRACTIONAL (common = present in
≥ ceil(1% of distinct docs)). This file pins the property the fix
exists for: selection ratio is nonzero at BOTH sf0.01 and sf0.1 and
stays in a sane band — if either scale ever selects (near-)nothing
or the ratios drift wildly apart, the pipeline has re-degenerated.

Measured at the time of pinning: 160/500 = 0.320 at sf0.01
(bit-identical to the pre-r14 pinned behavior, since ceil(1% · 500)
= 5) and 1592/5000 = 0.318 at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF001

SF01 = "/root/testdata/sf0.1"


class TestCurateScaleInvariance:
    def test_selection_ratio_nonzero_and_stable_across_scales(self, spark):
        from data_engineering_hs_spark.queries import REGISTRY, load_all

        load_all()
        fn = REGISTRY["t_curate_training_set"].fn
        from data_engineering_hs_spark.catalog import load_table

        ratios = {}
        for sf_dir in (SF001, SF01):
            n_docs = load_table(spark, sf_dir, "documents").count()
            n_sel = fn(spark, sf_dir).count()
            assert n_sel > 0, f"curation selected 0 docs at {sf_dir}"
            ratios[sf_dir] = n_sel / n_docs
        r1, r10 = ratios[SF001], ratios[SF01]
        # sane band: both scales keep a real fraction of the corpus
        # (neither "reject everything" nor "keep everything")...
        for sf_dir, r in ratios.items():
            assert 0.05 <= r <= 0.95, f"{sf_dir}: selection ratio {r:.3f}"
        # ...and the 10× corpus selects a similar fraction (generator
        # distributions are scale-invariant, so the pipeline's should
        # be too; 2× headroom absorbs sampling noise).
        assert max(r1, r10) / min(r1, r10) < 2.0, (r1, r10)

    def test_fractional_threshold_matches_absolute_at_sf001(self, spark):
        # ceil(1% · 500) = 5: at sf0.01 the fractional form must
        # reproduce the long-pinned absolute behavior bit-exactly.
        from data_engineering_hs_spark.catalog import load_table
        from data_engineering_hs_spark.operators.corpus import (
            boilerplate_ratio,
        )

        d = load_table(spark, SF001, "documents")
        frac = boilerplate_ratio(d, "text", "doc_id", min_doc_frac=0.01)
        absolute = boilerplate_ratio(d, "text", "doc_id", min_docs=5)
        assert frac.exceptAll(absolute).count() == 0
        assert absolute.exceptAll(frac).count() == 0

    def test_min_doc_frac_validates_range(self, spark):
        import pytest

        from data_engineering_hs_spark.catalog import load_table
        from data_engineering_hs_spark.operators.corpus import common_ngrams

        d = load_table(spark, SF001, "documents")
        with pytest.raises(ValueError, match="min_doc_frac"):
            common_ngrams(d, "text", "doc_id", min_doc_frac=0.0)
        with pytest.raises(ValueError, match="min_doc_frac"):
            common_ngrams(d, "text", "doc_id", min_doc_frac=1.5)
