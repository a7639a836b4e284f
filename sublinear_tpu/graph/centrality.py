"""Centrality measures: pagerank, closeness, betweenness.

Reference: GraphTools.computeCentralities
(/root/reference/src/mcp/tools/graph.ts:187-205).  Note the reference's
closeness/betweenness are ``Math.random()`` placeholders (graph.ts:337-368);
this framework implements the real measures:

  - closeness: batched bounded Bellman-Ford distance sweeps on-device (the
    BMSSP frontier machinery), closeness_i = (n-1) / sum_j d(i, j)
  - betweenness: sampled Brandes (host-side BFS accumulation over K source
    samples) — exact when sample covers all sources.
"""
from __future__ import annotations

import numpy as np

from ..matrix import Matrix
from ..solvers.bmssp import shortest_paths
from .pagerank import pagerank


def closeness_centrality(adjacency: Matrix, nodes=None, unit_weights: bool = True) -> dict:
    n = adjacency.shape[0]
    # unit edge costs: binarize the adjacency so cost = 1/|a| = 1
    if unit_weights:
        r, c, v = adjacency.csr.to_coo()
        off = r != c
        g = Matrix.from_coo(r[off], c[off], np.ones(off.sum()), (n, n))
    else:
        g = adjacency
    nodes = np.arange(n) if nodes is None else np.asarray(nodes, dtype=np.int64)
    closeness = np.zeros(n)
    for i in nodes:
        dist, _, _ = shortest_paths(g, [int(i)])
        d = dist[:n]
        reach = np.isfinite(d) & (d < 1e29)
        total = d[reach].sum()
        reachable = int(reach.sum()) - 1
        # Wasserman-Faust normalization for disconnected graphs
        closeness[i] = (reachable / (n - 1)) * (reachable / total) if total > 0 else 0.0
    return {
        "closenessVector": closeness.tolist(),
        "normalized": (closeness / max(n - 1, 1)).tolist(),
    }


def betweenness_centrality(adjacency: Matrix, num_samples: int | None = None, seed: int = 0) -> dict:
    """Sampled Brandes on the unweighted digraph (host-side BFS)."""
    n = adjacency.shape[0]
    csr = adjacency.csr
    # adjacency lists (ignoring self loops / weights)
    indptr, indices = csr.indptr, csr.indices
    rng = np.random.default_rng(seed)
    if num_samples is None or num_samples >= n:
        sources = np.arange(n)
        scale = 1.0
    else:
        sources = rng.choice(n, size=num_samples, replace=False)
        scale = n / num_samples

    bc = np.zeros(n)
    for s in sources:
        # BFS
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n)
        dist[s] = 0
        sigma[s] = 1.0
        order = [int(s)]
        head = 0
        preds: list[list[int]] = [[] for _ in range(n)]
        while head < len(order):
            u = order[head]
            head += 1
            for idx in range(indptr[u], indptr[u + 1]):
                w = int(indices[idx])
                if w == u:
                    continue
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = np.zeros(n)
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w] * scale
    denom = max((n - 1) * (n - 2), 1)
    return {"betweennessVector": bc.tolist(), "normalized": (bc / denom).tolist()}


def compute_centralities(adjacency: Matrix, measures=("pagerank", "closeness")) -> dict:
    results: dict = {}
    if "pagerank" in measures:
        pr = pagerank(adjacency)
        results["pagerank"] = pr.to_dict()
    if "closeness" in measures:
        results["closeness"] = closeness_centrality(adjacency)
    if "betweenness" in measures:
        results["betweenness"] = betweenness_centrality(adjacency)
    return results
