"""Network analysis — PageRank, centralities, communities, resistance.

Mirrors /root/reference/examples/network-analysis.
Run: python examples/network_analysis.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sublinear_tpu as slt
from sublinear_tpu.graph import (
    detect_communities,
    effective_resistance,
    pagerank,
    pagerank_statistics,
    personalized_pagerank,
)


def main():
    # two communities bridged by one edge
    n = 40
    dense = np.zeros((n, n))
    dense[:20, :20] = (np.random.default_rng(0).random((20, 20)) < 0.3)
    dense[20:, 20:] = (np.random.default_rng(1).random((20, 20)) < 0.3)
    np.fill_diagonal(dense, 0)
    dense[19, 20] = dense[20, 19] = 1.0
    A = slt.Matrix.from_dense(dense)

    pr = pagerank(A, damping=0.85)
    stats = pagerank_statistics(pr)
    print("top nodes:", [d["node"] for d in stats["topNodes"][:5]])
    print(f"entropy: {stats['statistics']['entropy']:.3f}")

    ppr = personalized_pagerank(A, [0, 1])
    print(f"personalized mass on seeds: {ppr.scores[[0, 1]].sum():.3f}")

    communities = detect_communities(A)
    print(f"communities found: {communities['quality']['numCommunities']} "
          f"(modularity {communities['modularity']:.3f})")

    # effective resistance across the bridge vs within a community
    deg = dense.sum(axis=1)
    L = slt.Matrix.from_dense(np.diag(deg) - dense)
    r_bridge = effective_resistance(L, 0, 39)["effectiveResistance"]
    r_local = effective_resistance(L, 0, 5)["effectiveResistance"]
    print(f"resistance across bridge {r_bridge:.3f} vs within community {r_local:.3f}")


if __name__ == "__main__":
    main()
