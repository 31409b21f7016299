"""Property tests for the distributed connected-components stage
(SURVEY.md §5.3): large-star/small-star must equal a union-find oracle on
random graphs, with and without the explicit salted-aggregation mode."""

import numpy as np
import pandas as pd
import pytest

from dedup.config import DEFAULT
from dedup.cc import connected_components
from dedup.oracle import UnionFind


def _random_case(seed: int, n_nodes: int, n_edges: int):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:04d}" for i in range(n_nodes)]
    edges = [
        (nodes[int(rng.integers(n_nodes))], nodes[int(rng.integers(n_nodes))])
        for _ in range(n_edges)
    ]
    return nodes, edges


def _oracle_partition(nodes, edges):
    uf = UnionFind()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in nodes}


@pytest.mark.parametrize(
    "seed,n_nodes,n_edges,salted",
    [(0, 60, 40, False), (1, 200, 300, False), (2, 400, 100, True), (3, 50, 0, False)],
)
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges, salted):
    nodes, edges = _random_case(seed, n_nodes, n_edges)
    want = _oracle_partition(nodes, edges)
    cfg = DEFAULT.with_(cc_salted_agg=salted)
    nodes_df = spark.createDataFrame(pd.DataFrame({"url": nodes}))
    edges_df = spark.createDataFrame(
        pd.DataFrame(edges or [("x", "x")], columns=["url_a", "url_b"])
    )
    got = dict(
        connected_components(edges_df, nodes_df, cfg)
        .toPandas()[["url", "cluster_id"]]
        .values.tolist()
    )
    for n in nodes:
        assert got[n] == want[n], (n, got[n], want[n])


def test_cc_single_giant_chain(spark):
    """A path graph is the worst case for label propagation (diameter n);
    large-star/small-star must converge in O(log n) rounds — well under
    cc_max_iters for a 256-node chain."""
    nodes = [f"c{i:04d}" for i in range(256)]
    edges = list(zip(nodes[:-1], nodes[1:]))
    nodes_df = spark.createDataFrame(pd.DataFrame({"url": nodes}))
    edges_df = spark.createDataFrame(pd.DataFrame(edges, columns=["url_a", "url_b"]))
    got = connected_components(edges_df, nodes_df, DEFAULT).toPandas()
    assert set(got["cluster_id"]) == {"c0000"}


def test_contracted_cc_equals_plain_cc(spark):
    """The exact-dup contraction (sha groups -> min-url reps) must give
    the SAME partition and cluster ids as plain CC whenever its
    precondition holds (each sha group is a clique via star edges — the
    sha tier guarantees this in the pipeline)."""
    from dedup.cc import connected_components_contracted

    rng = np.random.default_rng(7)
    # 30 sha groups of 1-8 members; every member carries its group's sha
    nodes, shas, stars = [], [], []
    for g in range(30):
        size = int(rng.integers(1, 9))
        members = [f"g{g:02d}m{i}" for i in range(size)]
        nodes += members
        shas += [(m, f"sha{g:02d}") for m in members]
        stars += [(members[0], m) for m in members[1:]]  # the sha star
    # random cross-group near-dup edges
    cross = [
        (nodes[int(rng.integers(len(nodes)))], nodes[int(rng.integers(len(nodes)))])
        for _ in range(40)
    ]
    edges = stars + cross
    nodes_df = spark.createDataFrame(pd.DataFrame({"url": nodes}))
    edges_df = spark.createDataFrame(pd.DataFrame(edges, columns=["url_a", "url_b"]))
    sha_df = spark.createDataFrame(pd.DataFrame(shas, columns=["url", "text_sha"]))
    plain = dict(
        connected_components(edges_df, nodes_df, DEFAULT)
        .toPandas()[["url", "cluster_id"]].values.tolist()
    )
    contracted = dict(
        connected_components_contracted(edges_df, nodes_df, sha_df, DEFAULT)
        .toPandas()[["url", "cluster_id"]].values.tolist()
    )
    assert contracted == plain
    assert contracted == _oracle_partition(nodes, edges)


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(11, 200, 300), (12, 50, 0), (13, 300, 80)])
def test_local_fast_path_equals_distributed(spark, seed, n_nodes, n_edges):
    """The driver-local union-find gate (local_max_edges) must be output-
    identical to the distributed star fixpoint on the same graph — the
    pipeline enables it by default (LOCAL_CC_MAX_EDGES), so its
    equivalence is load-bearing for every parity/resume suite."""
    nodes, edges = _random_case(seed, n_nodes, n_edges)
    nodes_df = spark.createDataFrame(pd.DataFrame({"url": nodes}))
    edges_df = spark.createDataFrame(
        pd.DataFrame(edges or [("x", "x")], columns=["url_a", "url_b"])
    )
    dist = dict(
        connected_components(edges_df, nodes_df, DEFAULT)
        .toPandas()[["url", "cluster_id"]].values.tolist()
    )
    local = dict(
        connected_components(edges_df, nodes_df, DEFAULT, local_max_edges=10**9)
        .toPandas()[["url", "cluster_id"]].values.tolist()
    )
    assert local == dist
    assert local == _oracle_partition(nodes, edges)
