"""One-permutation-hashing kernel gates (hashing.oph_minhash_with_runnerup)
and the M3 multi-probe headline comparison (SURVEY.md §7.1 M3):

DEFAULT (b=8 bands, T=8 probes/band) must match BANDING16 (b=16, T=1) on
candidate recall for the planted near/medium tiers while STORING half the
home bucket rows — the [MPLSH §5.3] "probe more, store less" claim
restated for the dedup graft. Probe rows are query-side shuffle volume,
not index storage, mirroring the paper's accounting.
"""

import numpy as np
import pytest

from dedup import hashing as H
from dedup.config import BANDING16, CLASSIC, DEFAULT, DedupConfig
from dedup.features import doc_features, minhash_params
from dedup.oracle import run_oracle
from dedup.synth import make_corpus

A, B = H.minhash_params(42, 128)


def _rand_sets(rng, n=600, overlap=300):
    base = rng.integers(0, 1 << 61, size=2 * n, dtype=np.uint64)
    s1 = np.unique(base[:n])
    s2 = np.unique(np.concatenate([base[:overlap], base[n : 2 * n - overlap]]))
    true_j = np.intersect1d(s1, s2).size / np.union1d(s1, s2).size
    return s1, s2, true_j


def test_oph_estimator_concentrates():
    rng = np.random.default_rng(1)
    for _ in range(30):
        s1, s2, tj = _rand_sets(rng, overlap=int(rng.integers(50, 550)))
        m1, _ = H.oph_minhash_with_runnerup(s1, 128, A[0], B[0])
        m2, _ = H.oph_minhash_with_runnerup(s2, 128, A[0], B[0])
        est = float((m1 == m2).mean())
        assert abs(est - tj) <= 3 / np.sqrt(128), (est, tj)


def test_oph_runnerup_and_densification():
    rng = np.random.default_rng(2)
    s = np.unique(rng.integers(0, 1 << 61, size=40, dtype=np.uint64))
    minh, run = H.oph_minhash_with_runnerup(s, 128, A[0], B[0])
    # runner-up never below the minimum on occupied bins; densified bins
    # (most of them: 40 values over 128 bins) have gap exactly 0
    x = H.mod61(s)
    h = H.mod61(H.mulmod61(np.full(x.shape, A[0], dtype=np.uint64), x) + B[0])
    bins = (h >> np.uint64(54)).astype(np.int64)
    h32 = h >> np.uint64(30)  # the kernel's 31-bit slot truncation
    occupied = np.unique(bins)
    filled = np.zeros(128, dtype=bool)
    filled[occupied] = True
    assert np.all(run[filled] >= minh[filled])
    assert np.array_equal(run[~filled], minh[~filled])
    # every slot value fits a SIGNED 32-bit int (the verify-stage
    # array<int> shuffle-narrowing guarantee)
    assert np.all(minh < (1 << 31)) and np.all(run < (1 << 31))
    # occupied-bin slots are the truncated bin minima of the raw hash
    for b_ in occupied:
        vals = np.sort(h32[bins == b_])
        assert minh[b_] == vals[0]
        assert run[b_] == (vals[1] if vals.size > 1 else vals[0])


def test_oph_deterministic_and_scheme_validation():
    rng = np.random.default_rng(3)
    s = np.unique(rng.integers(0, 1 << 61, size=200, dtype=np.uint64))
    m1, r1 = H.oph_minhash_with_runnerup(s, 128, A[0], B[0])
    m2, r2 = H.oph_minhash_with_runnerup(s.copy(), 128, A[0], B[0])
    assert np.array_equal(m1, m2) and np.array_equal(r1, r2)
    with pytest.raises(ValueError):
        H.oph_minhash_with_runnerup(s, 100, A[0], B[0])
    with pytest.raises(ValueError):
        DedupConfig(minhash_scheme="oph", minhash_k=96, bands=8, rows_per_band=12)
    with pytest.raises(ValueError):
        DedupConfig(minhash_scheme="nope")


def test_schemes_agree_on_jaccard_estimate():
    """OPH and classic K-hash are different estimators of the same
    quantity — on random set pairs their estimates must agree within the
    combined concentration bound."""
    rng = np.random.default_rng(4)
    a, b = minhash_params(CLASSIC)
    for _ in range(10):
        s1, s2, tj = _rand_sets(rng, overlap=int(rng.integers(100, 500)))
        o1, _ = H.oph_minhash_with_runnerup(s1, 128, a[0], b[0])
        o2, _ = H.oph_minhash_with_runnerup(s2, 128, a[0], b[0])
        c1, _ = H.minhash_with_runnerup(s1, a, b)
        c2, _ = H.minhash_with_runnerup(s2, a, b)
        est_oph = float((o1 == o2).mean())
        est_kxu = float((c1 == c2).mean())
        assert abs(est_oph - tj) <= 3 / np.sqrt(128)
        assert abs(est_kxu - tj) <= 3 / np.sqrt(128)


def test_doc_features_scheme_switch():
    a, b = minhash_params(DEFAULT)
    f_oph = doc_features("the quick brown fox jumps over the lazy dog " * 5,
                         DEFAULT, a, b)
    f_kxu = doc_features("the quick brown fox jumps over the lazy dog " * 5,
                         CLASSIC, a, b)
    assert not np.array_equal(f_oph.minhash, f_kxu.minhash)
    # non-minhash features are scheme-independent
    assert f_oph.simhash == f_kxu.simhash
    assert f_oph.text_sha == f_kxu.text_sha
    assert np.array_equal(f_oph.fingerprints, f_kxu.fingerprints)


# ---------------------------------------------------------------------------
# M3: multi-probe vs plain banding (the graft's headline claim)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def m3_runs():
    corpus = make_corpus("/root/testdata/sf0.001", seed=42)
    return (
        corpus,
        run_oracle(corpus.pages, DEFAULT),
        run_oracle(corpus.pages, BANDING16),
    )


def _tier_cand_recall(corpus, oracle, tiers):
    tp = corpus.truth_pairs
    sel = tp[tp["tier"].isin(tiers)]
    cand = set(map(tuple, oracle.candidates[["url_a", "url_b"]].values.tolist()))
    hits = sum(
        1 for a, b in sel[["url_a", "url_b"]].values.tolist() if (a, b) in cand
    )
    return hits, len(sel)


def test_m3_equal_recall_half_the_stored_rows(m3_runs):
    corpus, multi, plain = m3_runs
    for tiers in [("near",), ("medium",)]:
        h_m, n = _tier_cand_recall(corpus, multi, tiers)
        h_p, _ = _tier_cand_recall(corpus, plain, tiers)
        assert n > 0
        assert h_m >= h_p, (tiers, h_m, h_p)   # probes recover >= banding
        assert h_m / n >= 0.9, (tiers, h_m, n)
    stored_multi = int((~multi.buckets["is_probe"]).sum())
    stored_plain = int((~plain.buckets["is_probe"]).sum())
    # b=8 vs b=16 home rows: exactly half the stored index
    assert stored_multi * 2 == stored_plain
