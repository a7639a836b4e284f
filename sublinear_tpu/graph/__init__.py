from .centrality import betweenness_centrality, closeness_centrality, compute_centralities
from .community import detect_communities, label_propagation, modularity
from .pagerank import PageRankResult, pagerank, pagerank_statistics, personalized_pagerank
from .resistance import effective_resistance, grounded_laplacian

__all__ = [
    "PageRankResult",
    "pagerank",
    "pagerank_statistics",
    "personalized_pagerank",
    "effective_resistance",
    "grounded_laplacian",
    "compute_centralities",
    "closeness_centrality",
    "betweenness_centrality",
    "detect_communities",
    "label_propagation",
    "modularity",
]
