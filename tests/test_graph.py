"""Graph layer: pagerank vs power-iteration oracle, effective resistance vs
dense pseudo-inverse, centralities, communities.

Oracle style mirrors /root/reference/scripts/pagerank/traditional_pagerank.py
(NetworkX/power-iteration ground truth).
"""
import numpy as np
import pytest

import sublinear_tpu as slt
from sublinear_tpu.graph import (
    betweenness_centrality,
    closeness_centrality,
    detect_communities,
    effective_resistance,
    modularity,
    pagerank,
    pagerank_statistics,
    personalized_pagerank,
)


def ring_graph(n):
    rows = np.concatenate([np.arange(n), np.arange(n)])
    cols = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
    return slt.Matrix.from_coo(rows, cols, np.ones(2 * n), (n, n))


def random_digraph(n, p=0.1, seed=0):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < p).astype(float)
    np.fill_diagonal(dense, 0.0)
    return slt.Matrix.from_dense(dense), dense


def pagerank_oracle(dense, damping=0.85, iters=500, v=None):
    n = dense.shape[0]
    out = dense.sum(axis=1)
    P = np.divide(dense, out[:, None], out=np.zeros_like(dense), where=out[:, None] > 0)
    v = np.full(n, 1.0 / n) if v is None else v / v.sum()
    x = v.copy()
    for _ in range(iters):
        dangling = x[out == 0].sum()
        x = (1 - damping) * v + damping * (P.T @ x + dangling * v)
    return x / x.sum()


def test_pagerank_matches_power_iteration_oracle():
    A, dense = random_digraph(60, 0.12, seed=1)
    result = pagerank(A, damping=0.85, epsilon=1e-10)
    oracle = pagerank_oracle(dense)
    assert result.converged
    np.testing.assert_allclose(result.scores, oracle, atol=5e-5)
    assert abs(result.scores.sum() - 1.0) < 1e-5


def test_pagerank_uniform_on_ring():
    A = ring_graph(32)
    result = pagerank(A)
    np.testing.assert_allclose(result.scores, np.full(32, 1 / 32), atol=1e-5)


def test_personalized_pagerank_concentrates_mass():
    A, dense = random_digraph(50, 0.1, seed=2)
    r = personalized_pagerank(A, [3], damping=0.85, epsilon=1e-8)
    v = np.zeros(50)
    v[3] = 1.0
    oracle = pagerank_oracle(dense, v=v)
    np.testing.assert_allclose(r.scores, oracle, atol=1e-4)
    assert r.scores[3] > np.median(r.scores)


def test_pagerank_statistics_shape():
    A = ring_graph(20)
    stats = pagerank_statistics(pagerank(A))
    assert len(stats["topNodes"]) == 10
    assert "entropy" in stats["statistics"]
    assert 0 < stats["distribution"]["concentrationRatio"] <= 1.0


def test_effective_resistance_path_graph():
    # path graph of 3 nodes, unit edges: R(0,2) = 2 ohms in series
    n = 3
    rows = [0, 1, 1, 2]
    cols = [1, 0, 2, 1]
    adj = slt.Matrix.from_coo(rows, cols, np.ones(4), (n, n))
    deg = np.array([1.0, 2.0, 1.0])
    d = np.arange(n)
    L = slt.Matrix.from_coo(
        np.concatenate([rows, d]), np.concatenate([cols, d]),
        np.concatenate([-np.ones(4), deg]), (n, n),
    )
    r = effective_resistance(L, 0, 2, epsilon=1e-10)
    assert abs(r["effectiveResistance"] - 2.0) < 1e-4
    r01 = effective_resistance(L, 0, 1, epsilon=1e-10)
    assert abs(r01["effectiveResistance"] - 1.0) < 1e-4


def test_closeness_centrality_star():
    # star graph: center has max closeness
    n = 9
    rows = np.concatenate([np.zeros(n - 1), np.arange(1, n)]).astype(int)
    cols = np.concatenate([np.arange(1, n), np.zeros(n - 1)]).astype(int)
    A = slt.Matrix.from_coo(rows, cols, np.ones(2 * (n - 1)), (n, n))
    c = np.asarray(closeness_centrality(A)["closenessVector"])
    assert np.argmax(c) == 0


def test_betweenness_centrality_path():
    # path 0-1-2: middle node carries all shortest paths
    rows = [0, 1, 1, 2]
    cols = [1, 0, 2, 1]
    A = slt.Matrix.from_coo(rows, cols, np.ones(4), (3, 3))
    bc = np.asarray(betweenness_centrality(A)["betweennessVector"])
    assert bc[1] > bc[0] and bc[1] > bc[2]


def test_community_detection_two_cliques():
    # two 5-cliques joined by a single edge
    n = 10
    dense = np.zeros((n, n))
    dense[:5, :5] = 1.0
    dense[5:, 5:] = 1.0
    np.fill_diagonal(dense, 0.0)
    dense[4, 5] = dense[5, 4] = 1.0
    A = slt.Matrix.from_dense(dense)
    result = detect_communities(A, seed=3)
    a = np.asarray(result["assignments"])
    # the two cliques get distinct labels
    assert len(set(a[:5])) == 1 and len(set(a[5:])) == 1 and a[0] != a[9]
    assert result["modularity"] > 0.3
    assert result["quality"]["numCommunities"] == 2


def test_modularity_null():
    A, _ = random_digraph(20, 0.3, seed=4)
    q = modularity(A, np.zeros(20, dtype=np.int64))
    assert abs(q) < 0.35  # single community has near-zero modularity


def test_betweenness_device_matches_host_oracle():
    """Device level-synchronous Brandes == exact host Brandes (round-1 weak
    spot: betweenness was host-only python BFS; closeness dispatched one
    solve per node)."""
    from sublinear_tpu.graph.centrality import betweenness_centrality

    n = 60
    rng = np.random.default_rng(3)
    r = rng.integers(0, n, 300)
    c = rng.integers(0, n, 300)
    keep = r != c
    A = slt.Matrix.from_coo(r[keep], c[keep], np.ones(keep.sum()), (n, n))
    host = betweenness_centrality(A, backend="host")
    dev = betweenness_centrality(A, backend="device")
    np.testing.assert_allclose(
        dev["betweennessVector"], host["betweennessVector"], rtol=1e-4, atol=1e-4
    )


def test_closeness_batched_matches_per_source():
    from sublinear_tpu.graph.centrality import closeness_centrality
    from sublinear_tpu.solvers.bmssp import batched_distances, shortest_paths

    n = 50
    rng = np.random.default_rng(5)
    r = rng.integers(0, n, 220)
    c = rng.integers(0, n, 220)
    keep = r != c
    r, c = r[keep], c[keep]
    key = r.astype(np.int64) * n + c
    _, ui = np.unique(key, return_index=True)  # simple graph: no multi-edges
    r, c = r[ui], c[ui]
    A = slt.Matrix.from_coo(r, c, np.ones(len(r)), (n, n))
    batched = batched_distances(A, np.arange(n), unit_weights=True, chunk=16)
    for i in (0, 7, 23):
        d_i, _, _ = shortest_paths(A, [i])
        np.testing.assert_allclose(batched[i], d_i[:n], rtol=1e-5, atol=1e-5)
    out = closeness_centrality(A)
    assert len(out["closenessVector"]) == n
    assert max(out["closenessVector"]) > 0
