"""Centrality measures: pagerank, closeness, betweenness.

Reference: GraphTools.computeCentralities
(/root/reference/src/mcp/tools/graph.ts:187-205).  Note the reference's
closeness/betweenness are ``Math.random()`` placeholders (graph.ts:337-368);
this framework implements the real measures, on-device:

  - closeness: batched multi-source Bellman-Ford distance sweeps — ONE
    device dispatch per source chunk (round 1 dispatched per node),
    closeness_i = Wasserman-Faust normalized inverse farness
  - betweenness: level-synchronous Brandes fully on-device — batched BFS
    levels, sigma forward accumulation and dependency back-propagation are
    all regular gathers over the in-/out-edge tables (the host BFS is kept
    as the exact oracle for small graphs/tests)
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..matrix import Matrix
from ..solvers.bmssp import (INF, batched_distances, batched_distances_device,
                              in_edge_tables, shortest_paths)
from .pagerank import pagerank

_TINY = 1e-30


def _unit_graph(adjacency: Matrix) -> Matrix:
    n = adjacency.shape[0]
    r, c, v = adjacency.csr.to_coo()
    off = r != c
    return Matrix.from_coo(r[off], c[off], np.ones(int(off.sum())), (n, n))


def closeness_centrality(adjacency: Matrix, nodes=None, unit_weights: bool = True) -> dict:
    n = adjacency.shape[0]
    g = _unit_graph(adjacency) if unit_weights else adjacency
    nodes = np.arange(n) if nodes is None else np.asarray(nodes, dtype=np.int64)
    closeness = np.zeros(n)
    # per-chunk device sweeps; farness reduced ON DEVICE so only (S, 2)
    # scalars cross the tunnel per chunk
    for c0 in range(0, nodes.size, 256):
        cs = nodes[c0 : c0 + 256]
        dist = batched_distances_device(g, cs, unit_weights=unit_weights)
        reach = (dist < INF * 0.5) & jnp.isfinite(dist)
        # exclude padded rows
        reach = reach & (jnp.arange(dist.shape[0])[:, None] < n)
        total = jnp.sum(jnp.where(reach, dist, 0.0), axis=0)
        reachable = jnp.sum(reach, axis=0) - 1
        total = np.asarray(jax.device_get(total), dtype=np.float64)
        reachable = np.asarray(jax.device_get(reachable), dtype=np.float64)
        for j, i in enumerate(cs):
            # Wasserman-Faust normalization for disconnected graphs
            closeness[i] = (
                (reachable[j] / (n - 1)) * (reachable[j] / total[j])
                if total[j] > 0 else 0.0
            )
    return {
        "closenessVector": closeness.tolist(),
        "normalized": (closeness / max(n - 1, 1)).tolist(),
    }


# ------------------------------------------------------------ device Brandes

@jax.jit
def _brandes_chunk(in_srcs, in_mask, out_dsts, out_mask, dist, L):
    """sigma forward + dependency backward for one source chunk.

    dist: (n_pad, S) BFS levels (INF where unreachable; batch axis MINOR so
    gathers pull contiguous S-float rows — the wide-gather fast path), L:
    max finite level.  Returns the per-node dependency sums (n_pad,)."""
    src_mask = dist == 0.0
    sigma0 = jnp.where(src_mask, 1.0, 0.0).astype(dist.dtype)

    def fwd(l, sigma):
        g_dist = jnp.take(dist, in_srcs, axis=0)             # (n, K, S)
        g_sig = jnp.take(sigma, in_srcs, axis=0)
        pred = in_mask[:, :, None] & (g_dist == (dist[:, None, :] - 1.0))
        contrib = jnp.sum(jnp.where(pred, g_sig, 0.0), axis=1)
        lf = l.astype(dist.dtype)
        return jnp.where(dist == lf, contrib, sigma)

    sigma = jax.lax.fori_loop(1, L + 1, fwd, sigma0)

    def bwd(i, delta):
        l = (L - 1 - i).astype(dist.dtype)
        g_dist = jnp.take(dist, out_dsts, axis=0)
        g_sig = jnp.take(sigma, out_dsts, axis=0)
        g_del = jnp.take(delta, out_dsts, axis=0)
        succ = out_mask[:, :, None] & (g_dist == (dist[:, None, :] + 1.0))
        ratio = jnp.sum(
            jnp.where(succ, (1.0 + g_del) / jnp.maximum(g_sig, _TINY), 0.0), axis=1
        )
        cand = sigma * ratio
        return jnp.where(dist == l, cand, delta)

    delta = jax.lax.fori_loop(0, L, bwd, jnp.zeros_like(sigma))
    # accumulate only reachable non-source nodes
    contrib = jnp.where((dist > 0.0) & (dist < INF * 0.5), delta, 0.0)
    return jnp.sum(contrib, axis=1)


def betweenness_centrality(
    adjacency: Matrix, num_samples: int | None = None, seed: int = 0,
    backend: str = "auto", chunk: int = 256,
) -> dict:
    """Brandes betweenness on the unweighted digraph.

    backend='device' (default above tiny n): batched level-synchronous
    Brandes.  Measured (one v5e through the dev tunnel, warm): n=3000
    all-sources in 1.7 s vs 53 s host python BFS (31x; the residual cost is
    ~2 tunnel RPCs per 256-source chunk, so a locally-attached chip sits
    near the pure kernel ratio of >100x).  'host' is the exact oracle."""
    n = adjacency.shape[0]
    if backend == "auto":
        backend = "device" if n >= 192 else "host"
    rng = np.random.default_rng(seed)
    if num_samples is None or num_samples >= n:
        sources = np.arange(n)
        scale = 1.0
    else:
        sources = rng.choice(n, size=num_samples, replace=False)
        scale = n / num_samples

    if backend == "host":
        bc = _betweenness_host(adjacency, sources, scale)
    else:
        bc = _betweenness_device(adjacency, sources, scale, chunk)
    denom = max((n - 1) * (n - 2), 1)
    return {"betweennessVector": bc.tolist(), "normalized": (bc / denom).tolist()}


def _betweenness_device(adjacency: Matrix, sources, scale: float, chunk: int) -> np.ndarray:
    n = adjacency.shape[0]
    g = _unit_graph(adjacency)
    gT = g.transpose()
    t_in = in_edge_tables(g)      # in-edges: predecessors
    t_out = in_edge_tables(gT)    # in-edges of transpose = successors
    in_mask = np.asarray(t_in.costs) < INF * 0.5
    out_mask = np.asarray(t_out.costs) < INF * 0.5
    in_mask_dev = jnp.asarray(in_mask)
    out_mask_dev = jnp.asarray(out_mask)
    bc = np.zeros(n)
    for c0 in range(0, len(sources), chunk):
        cs = np.asarray(sources[c0 : c0 + chunk])
        # dist stays ON DEVICE between the BFS and Brandes phases; only one
        # scalar (the max level) and the (n,) dependency sum cross the tunnel
        dist = batched_distances_device(g, cs, unit_weights=True)
        finite_max = jnp.max(jnp.where(dist < INF * 0.5, dist, -1.0))
        L = int(jax.device_get(finite_max))
        if L <= 0:
            continue
        delta = _brandes_chunk(
            t_in.srcs, in_mask_dev, t_out.srcs, out_mask_dev, dist, jnp.int32(L),
        )
        bc += np.asarray(jax.device_get(delta), dtype=np.float64)[:n] * scale
    return bc


def _betweenness_host(adjacency: Matrix, sources, scale: float) -> np.ndarray:
    """Exact sequential Brandes (oracle; reference intent graph.ts:187-205)."""
    n = adjacency.shape[0]
    csr = adjacency.csr
    indptr, indices = csr.indptr, csr.indices
    bc = np.zeros(n)
    for s in sources:
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
    return bc


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
