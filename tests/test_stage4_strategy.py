"""The two physical strategies for stage-4 verify's signature-attach
joins (full vs semi; stages.STAGE4_STRATEGY) must be output-identical on
the verified pairs — the semi path only prunes signature rows that no
candidate pair references, so every joined row survives unchanged."""

import pandas as pd

from dedup import stages
from dedup.config import DEFAULT
from dedup.synth import load_pages_spark

SF = "/root/testdata/sf0.001"


def test_stage4_strategies_identical(spark):
    pages = load_pages_spark(spark, SF).cache()
    fused = stages.stage12_fused(pages, DEFAULT).cache()
    sigs = stages.signatures_from_fused(fused)
    buckets = stages.buckets_from_fused(fused)
    out = stages.stage3_candidates(sigs, buckets, DEFAULT)
    cand = out.candidates.cache()

    def run(strategy):
        return (
            stages.stage4_verify(cand, sigs, pages, DEFAULT, strategy=strategy)
            .toPandas()
            .sort_values(["url_a", "url_b"], ignore_index=True)
        )

    full, semi = run("full"), run("semi")
    assert len(full) > 0
    pd.testing.assert_frame_equal(full, semi)

    out.entries.unpersist()
    out.counts.unpersist()
    cand.unpersist()
    fused.unpersist()
    pages.unpersist()


def test_stage4_rejects_unknown_strategy(spark):
    import pytest

    pages = load_pages_spark(spark, SF)
    with pytest.raises(ValueError, match="unknown stage-4 strategy"):
        stages.stage4_verify(pages, pages, pages, DEFAULT, strategy="bogus")
