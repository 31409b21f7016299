"""SemDedup (dedup/semdedup.py): exact Spark-vs-NumPy-reference parity
on the fixture, and a planted-duplicate behavior gate."""

import numpy as np
import pandas as pd
import pytest

from dedup.ivf import IvfConfig
from dedup.semdedup import SemDedupConfig, reference_keep_frame, semdedup_keep


def _collect_map(df):
    return {
        int(r["vec_id"]): (int(r["cid"]), bool(r["keep"]))
        for r in df.collect()
    }


def test_semdedup_spark_matches_reference_exactly(spark):
    """The distributed plan (Arrow assignment + cid-keyed pair join +
    fixed-point cosine) must reproduce the single-process reference
    bit-for-bit on the real fixture embeddings — the same frame the
    DuckDB twin SELECTs."""
    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = _collect_map(semdedup_keep(emb, SemDedupConfig()))
    ref = reference_keep_frame(
        pd.read_parquet(f"{sf}/embeddings.parquet"), SemDedupConfig()
    )
    want = {
        int(r.vec_id): (int(r.cid), bool(r.keep))
        for r in ref.itertuples(index=False)
    }
    assert got == want and len(got) == emb.count()


def test_semdedup_drops_planted_duplicates(spark):
    """Plant near-exact duplicates (cosine ~1) of a subset of vectors:
    every planted copy must be dropped (its source has a lower id), every
    original must survive, and kept vectors within a cluster must be
    pairwise below tau."""
    rng = np.random.default_rng(7)
    n, d = 200, 64
    X = rng.standard_normal((n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    dup_src = np.arange(0, 60, 3)  # 20 sources
    dups = X[dup_src] + 1e-4 * rng.standard_normal((len(dup_src), d))
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    allX = np.vstack([X, dups])
    ids = np.arange(len(allX))
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [r.astype(np.float32) for r in allX]}
    )
    emb = spark.createDataFrame(pdf)
    # tau high enough that random unit vectors (cos ~ N(0, 1/8)) never
    # collide, low enough that the planted copies (cos ~ 1) always do
    cfg = SemDedupConfig(tau=0.9, ivf=IvfConfig(k_centroids=8, sample_cap=200))
    got = _collect_map(semdedup_keep(emb, cfg))
    assert len(got) == len(allX)
    for k, src in enumerate(dup_src):
        copy_id = n + k
        assert got[copy_id][1] is False, f"planted copy {copy_id} kept"
        assert got[src][1] is True, f"source {src} dropped"
        # the copy must land in its source's cluster for the pair to
        # have been examined (sanity of the clustering step)
        assert got[copy_id][0] == got[src][0]
    # originals are mutually non-duplicate at tau=0.9
    assert all(got[i][1] for i in range(n))


def test_semdedup_reference_is_deterministic():
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = reference_keep_frame(emb, SemDedupConfig())
    b = reference_keep_frame(emb.sample(frac=1.0, random_state=3), SemDedupConfig())
    pd.testing.assert_frame_equal(a, b)


def test_semdedup_zero_norm_vectors_never_duplicate(spark):
    """A vector whose components all quantize to zero has cos = 0/0
    against everything; the pinned rule (both engines) is that zero-norm
    vectors are never anyone's duplicate — Spark's NaN ordering would
    otherwise silently drop the paired side while NumPy keeps it."""
    rng = np.random.default_rng(11)
    X = rng.standard_normal((50, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X[7] = 0.0  # quantizes to the zero vector
    X[31] = 2.0 ** -21  # sub-quantum positive values: also zero-norm
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(50),
            "embedding": [r.astype(np.float32) for r in X],
        }
    )
    cfg = SemDedupConfig(tau=0.9, ivf=IvfConfig(k_centroids=4, sample_cap=50))
    got = _collect_map(semdedup_keep(spark.createDataFrame(pdf), cfg))
    ref = reference_keep_frame(pdf, cfg)
    want = {
        int(r.vec_id): (int(r.cid), bool(r.keep))
        for r in ref.itertuples(index=False)
    }
    assert got == want
    assert got[7][1] is True and got[31][1] is True
