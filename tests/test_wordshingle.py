"""Word-shingle mode (F2: SURVEY.md §7.0 "word w=3") parity gates: the
Spark pipeline and the NumPy oracle must agree bit-for-bit in BOTH
shingle modes, and the word kernel must behave like a shingle set."""

import numpy as np
import pytest

from dedup import hashing as H
from dedup.config import DEFAULT, DedupConfig
from dedup.oracle import run_oracle
from dedup import pipeline

WORD = DEFAULT.with_(shingle_mode="word")


def test_word_shingles_kernel():
    norm = H.normalize("the quick brown fox jumps over the lazy dog")
    s3 = H.word_shingles(norm, 3)
    # 9 tokens -> 7 windows, all distinct here
    assert s3.size == 7
    assert np.array_equal(s3, np.unique(s3))
    # repeated windows dedup (set semantics)
    rep = H.normalize("a b c a b c a b c")
    assert H.word_shingles(rep, 3).size < 7
    # shorter than one window: whole-doc hash, never empty for nonempty text
    assert H.word_shingles(H.normalize("two words"), 3).size == 1
    # deterministic + position-independent of trailing whitespace collapse
    assert np.array_equal(
        H.word_shingles(H.normalize("x  y\tz w"), 3),
        H.word_shingles(H.normalize("x y z w"), 3),
    )


def test_word_mode_config_roundtrip():
    assert WORD.shingle_mode == "word"
    assert WORD.config_hash() != DEFAULT.config_hash()
    with pytest.raises(ValueError):
        DedupConfig(shingle_mode="sentence")


def test_word_mode_oracle_vs_spark_parity(spark, corpus_smoke, tmp_path_factory):
    """Full-pipeline bit-for-bit parity in word mode at sf0.001 (the same
    gate the char mode gets in tests/test_parity.py)."""
    from dedup.synth import pages_schema

    wh_root = str(tmp_path_factory.mktemp("wh_word"))
    pages_sdf = spark.createDataFrame(corpus_smoke.pages, schema=pages_schema())
    res = pipeline.run(spark, pages_sdf, WORD, wh_root)
    oracle = run_oracle(corpus_smoke.pages, WORD)

    got = (
        res.df(spark, "signatures").toPandas().sort_values("url", ignore_index=True)
    )
    want = oracle.signatures.sort_values("url", ignore_index=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert np.array_equal(
        np.array(got["minhash"].tolist()), np.array(want["minhash"].tolist())
    )
    assert got["n_shingles"].tolist() == want["n_shingles"].tolist()

    got_cl = res.df(spark, "clusters").toPandas().sort_values("url", ignore_index=True)
    want_cl = oracle.clusters.sort_values("url", ignore_index=True)
    assert got_cl["cluster_id"].tolist() == want_cl["cluster_id"].tolist()

    # exact-dup tier must still be perfect in word mode
    truth = corpus_smoke.truth_pairs.query("tier == 'exact'")
    cl = dict(got_cl[["url", "cluster_id"]].values.tolist())
    assert all(
        cl[a] == cl[b] for a, b in truth[["url_a", "url_b"]].values.tolist()
    )


def test_modes_detect_different_granularity():
    """Char k=5 and word w=3 shingles are different feature spaces: a
    one-character typo inside a word changes at most k char-shingles but
    every word-shingle containing that word."""
    a = H.normalize("alpha beta gamma delta epsilon zeta eta theta")
    b = H.normalize("alpha beta gamma delto epsilon zeta eta theta")
    cj = len(np.intersect1d(H.char_shingles(a, 5), H.char_shingles(b, 5))) / len(
        np.union1d(H.char_shingles(a, 5), H.char_shingles(b, 5))
    )
    wj = len(np.intersect1d(H.word_shingles(a, 3), H.word_shingles(b, 3))) / len(
        np.union1d(H.word_shingles(a, 3), H.word_shingles(b, 3))
    )
    assert wj < cj  # word mode punishes the typo harder
