"""Classic p-stable multi-probe LSH gates (dedup/mplsh.py):

1. the [MPLSH §4.1] probe-sequence order pinned on a worked example;
2. Spark candidate sets EXACTLY equal the single-process NumPy reference
   search (shared kernels + equivalent join logic);
3. recall@5 >= 0.9 at T=16 on the embeddings fixture vs brute force;
4. on planted clustered vectors: high recall at ~1% of pairs examined,
   and the [MPLSH] headline — probing (L=2, T=16) beats 4x more tables
   (L=8, T=1) at equal W;
5. the hot-key cap drops oversized buckets (count -> semi-join).
"""

import numpy as np
import pandas as pd
import pytest

from dedup.mplsh import (
    MplshConfig,
    mplsh_topk,
    probe_sets_pstable,
    pstable_params,
    project,
    compound_key_hash,
    reference_candidates,
    reference_topk,
)

SF = "/root/testdata/sf0.001"


def _load(sf=SF):
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    return X, emb["vec_id"].to_numpy()


def test_probe_sequence_worked_example():
    """M=2, frac=[0.2, 0.9]: perturbation scores are
    (slot0,-1)=0.2 (slot0,+1)=0.8 (slot1,-1)=0.9 (slot1,+1)=0.1.
    Ascending-score valid sets: {(1,+1)}=0.1, {(0,-1)}=0.2,
    {(0,-1),(1,+1)}=0.3, {(0,+1)}=0.8; the set {(1,+1),(1,-1)} (score
    1.0) is invalid (same slot twice) and must be skipped."""
    sets = probe_sets_pstable(np.array([0.2, 0.9]), t_probes=6)
    norm = [tuple(sorted(s)) for s in sets]
    assert norm[0] == ((1, 1),)
    assert norm[1] == ((0, -1),)
    assert norm[2] == ((0, -1), (1, 1))
    assert norm[3] == ((0, 1),)
    # no set may perturb one slot twice
    for s in norm:
        slots = [m for m, _ in s]
        assert len(slots) == len(set(slots))


def test_probe_scores_monotonic():
    rng = np.random.default_rng(0)
    for _ in range(20):
        frac = rng.uniform(0, 1, size=6)
        sets = probe_sets_pstable(frac, t_probes=12)
        scores = [
            sum(frac[m] if d == -1 else 1 - frac[m] for m, d in s) for s in sets
        ]
        assert scores == sorted(scores)


def test_spark_candidates_match_reference(spark):
    """The bucket-join candidate set must equal the NumPy reference search
    exactly (integer key equality; shared kernels)."""
    from pyspark.sql import functions as F
    from dedup.mplsh import key_hash_flat  # noqa: F401 (import check)

    X, ids = _load()
    cfg = MplshConfig()
    ref = reference_candidates(X, cfg)
    ref_pairs = {
        (int(ids[i]), int(ids[j])) for i, cs in enumerate(ref) for j in cs
    }

    emb_df = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": [list(map(float, r)) for r in X]})
    )
    # rebuild the operator's candidate sub-plan (before re-rank)
    out = mplsh_topk(emb_df, cfg, k=10**9)  # k larger than any candidate set
    got = out.select("query_id", "neighbor_id").toPandas()
    got_pairs = set(map(tuple, got.values.tolist()))
    assert got_pairs == ref_pairs


def test_fixture_recall_at_t16(spark):
    """Recall@5 >= 0.9 vs exact brute force on the (diffuse) embeddings
    fixture at the default T=16 config (measured 0.98)."""
    X, ids = _load()
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    truth = {
        int(ids[i]): {int(ids[j]) for j in np.lexsort((ids, d2[i]))[:5]}
        for i in range(len(ids))
    }
    approx = reference_topk(X, ids, MplshConfig(), k=5)
    hits = sum(len(truth[q] & set(approx[q])) for q in truth)
    recall = hits / (5 * len(truth))
    assert recall >= 0.9, f"recall@5 {recall:.3f}"

    # and the Spark operator agrees with the reference top-k on a slice.
    # Candidate sets are exact (integer keys, asserted above); the float
    # re-rank can differ in the last ulp between Spark's left-fold and
    # numpy's pairwise sum, so near-ties at the rank-5/6 boundary may
    # swap — require >= 4/5 overlap per query instead of set equality.
    import __spark_entry__ as e

    got = e.queries()["mplsh_knn"](spark, SF).toPandas()
    for q, grp in got.groupby("query_id"):
        assert len(set(grp["neighbor_id"]) & set(approx[int(q)])) >= 4


def _planted(n_clusters=100, per=5, noise=0.02, d=64, seed=123):
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_clusters, d))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    X = np.repeat(c, per, axis=0) + noise * rng.standard_normal((n_clusters * per, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


def _recall_and_candfrac(X, cfg, k=4):
    ids = np.arange(X.shape[0])
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    truth = {i: set(np.lexsort((ids, d2[i]))[:k]) for i in range(len(ids))}
    cands = reference_candidates(X, cfg)
    top = reference_topk(X, ids, cfg, k)
    hits = sum(len(truth[i] & set(top[i])) for i in truth)
    n = X.shape[0]
    frac = sum(len(c) for c in cands) / (n * (n - 1))
    return hits / (k * len(truth)), frac


def test_planted_structure_high_recall_low_candidates():
    """Clustered data (LSH's intended regime): recall@4 >= 0.95 while
    examining <= 2% of all pairs (measured 0.998 / 1.0%)."""
    X = _planted()
    cfg = MplshConfig(l_tables=4, m_hashes=8, w=1.0, t_probes=16)
    recall, frac = _recall_and_candfrac(X, cfg)
    assert recall >= 0.95, f"recall {recall:.3f}"
    assert frac <= 0.02, f"candidate fraction {frac:.3f}"


def test_multiprobe_beats_more_tables():
    """[MPLSH §5.3] restated: L=2 tables with T=16 probes must reach
    HIGHER recall than 4x the tables (L=8) with no probes, at equal W —
    probing neighbor buckets replaces whole tables (measured 0.96 vs
    0.84)."""
    X = _planted()
    multi, _ = _recall_and_candfrac(
        X, MplshConfig(l_tables=2, m_hashes=8, w=1.0, t_probes=16)
    )
    tables, _ = _recall_and_candfrac(
        X, MplshConfig(l_tables=8, m_hashes=8, w=1.0, t_probes=1)
    )
    assert multi > tables, f"multi-probe {multi:.3f} <= tables {tables:.3f}"
    assert multi >= 0.9


def test_hot_key_cap_drops_buckets():
    """max_key_bucket=0 drops every bucket -> zero candidates; cap=1
    (singleton home buckets only) must shrink the candidate sets vs the
    default cap."""
    X, _ids = _load()
    assert all(len(c) == 0 for c in reference_candidates(X, MplshConfig(max_key_bucket=0)))
    tight = reference_candidates(X, MplshConfig(max_key_bucket=1))
    loose = reference_candidates(X, MplshConfig())
    assert sum(map(len, tight)) < sum(map(len, loose))
    assert all(t <= l for t, l in zip(map(len, tight), map(len, loose)))
