"""Graph operators: link analysis, components, triangles, centrality,
similarity, traversals — each an iterative (or single-pass) DataFrame program.
"""

from cassovary_spark.operators.pagerank import pagerank, PageRankResult
from cassovary_spark.operators.components import connected_components
from cassovary_spark.operators.labelprop import label_propagation
from cassovary_spark.operators.triangles import triangle_count, transitivity_stats
from cassovary_spark.operators.centrality import degree_centrality, closeness_centrality
from cassovary_spark.operators.hits import hits, HitsResult
from cassovary_spark.operators.similarity import (
    jaccard_similarity_top_k,
    cosine_similarity_top_k,
)
from cassovary_spark.operators.mutual import mutual_edge_count
from cassovary_spark.operators.kcore import k_core
from cassovary_spark.operators.stats import degree_assortativity, degree_distribution
from cassovary_spark.operators.anf import (
    effective_diameter,
    harmonic_centrality_sketch,
    neighborhood_function,
)
from cassovary_spark.operators.bipartite import bipartite_link_analysis, BipartiteAnalysis
from cassovary_spark.operators.node_ops import (
    neighbor_lists,
    neighbor_counts,
    is_neighbor,
    intersect_neighbors,
    random_neighbors,
    exists_node,
)
from cassovary_spark.operators.tourists import (
    visits_counter,
    prev_nbr_counter,
    paths_counter,
    info_keeper,
)
from cassovary_spark.operators.traversals import (
    bfs,
    multi_source_bfs,
    all_paths_walk,
    random_walk_events,
    dfs_times,
    random_walk_visits,
    personalized_pagerank,
)

__all__ = [
    "pagerank",
    "PageRankResult",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "transitivity_stats",
    "degree_centrality",
    "closeness_centrality",
    "hits",
    "HitsResult",
    "jaccard_similarity_top_k",
    "cosine_similarity_top_k",
    "mutual_edge_count",
    "k_core",
    "degree_assortativity",
    "degree_distribution",
    "neighborhood_function",
    "harmonic_centrality_sketch",
    "effective_diameter",
    "bipartite_link_analysis",
    "BipartiteAnalysis",
    "bfs",
    "multi_source_bfs",
    "all_paths_walk",
    "random_walk_visits",
    "random_walk_events",
    "dfs_times",
    "personalized_pagerank",
    "visits_counter",
    "prev_nbr_counter",
    "paths_counter",
    "info_keeper",
    "neighbor_lists",
    "neighbor_counts",
    "is_neighbor",
    "intersect_neighbors",
    "random_neighbors",
    "exists_node",
]
