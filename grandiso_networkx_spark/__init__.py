"""grandiso_networkx_spark — a PySpark-native link-graph analytics engine.

From-scratch re-expression of aplbrain/grandiso-networkx's motif
(subgraph monomorphism/isomorphism) search as distributed frontier
expansion over candidate-binding DataFrames, plus the north-rule
iterative analytics passes (PageRank, connected components, label
propagation, triangle counting) the reference does not have.
"""

__version__ = "0.1.0"

from .graph import HostGraph
from .plans.motif import Motif, compile_plan, uniform_node_interestingness
from .operators.betweenness import betweenness_centrality, edge_betweenness
from .operators.anomaly import robust_outliers
from .operators.asof import asof_join
from .operators.bfs import bfs_levels, double_sweep, landmark_distances
from .operators.bipartite import bipartite_project
from .operators.components import (
    connected_components,
    connected_components_star,
)
from .operators.closeness import (
    closeness_centrality,
    eccentricity,
    harmonic_centrality,
)
from .operators.coloring import greedy_coloring
from .operators.cms import cms_build, cms_heavy_hitters, cms_query
from .operators.community import (
    local_community,
    modularity,
    partition_agreement,
    partition_quality,
)
from .operators.cooccur import pmi_pairs, skipgram_pairs
from .operators.curation import (
    curate_corpus,
    dataset_split,
    stratified_sample,
)
from .operators.eigenvector import eigenvector_centrality
from .operators.features import feature_propagation, neighbor_mean_features
from .operators.frontier import expand_step
from .operators.funnel import funnel
from .operators.hits import hits
from .operators.dag import coarsen_graph, longest_path_levels
from .operators.hypertable import hypertable_rollup
from .operators.hyperball import (
    effective_diameter,
    hyperball,
    hyperball_centralities,
    neighborhood_function,
    two_hop_counts,
)
from .operators.katz import katz_centrality
from .operators.kcore import (
    core_number,
    k_core,
    k_truss,
    onion_layers,
    truss_number,
)
from .operators.label_propagation import (
    label_propagation,
    seeded_label_propagation,
)
from .operators.linkpred import link_prediction_scores
from .operators.match import find_motifs, find_motifs_df, find_motifs_iter
from .operators.mis import maximal_independent_set
from .operators.mst import minimum_spanning_forest
from .operators.neighbor_minhash import (
    minhash_neighbor_signatures,
    neighbor_similarity_pairs,
)
from .operators.olap import (
    event_rollup,
    retention_cohorts,
    top_transitions_per_user,
    user_activity_features,
    user_running_totals,
)
from .operators.packing import (
    chunk_documents,
    mixture_sample,
    mixture_weights,
    pack_sequences,
    pack_stats,
)
from .operators.lmscore import (
    bigram_logprob,
    bigram_model,
    lm_quality_buckets,
    unigram_logprob,
)
from .operators.tokenize import heaps_fit, token_ids, vocab_table, zipf_fit
from .operators.bpe import bpe_encode, bpe_merges, bpe_vocab
from .operators.sparsify import sparsify_similarity
from .operators.matching import maximal_matching, vertex_cover_2approx
from .operators.pagerank import pagerank
from .operators.rangejoin import interval_join
from .operators.ppr import personalized_pagerank
from .operators.retrieval import bm25_topk, tfidf_terms
from .operators.sampling import ego_net, link_training_pairs, neighbor_sample
from .operators.scc import strongly_connected_components
from .operators.similarity import embedding_clusters
from .operators.sssp import sssp
from .operators.temporal import earliest_arrival
from .operators.stats import (
    attribute_assortativity,
    reciprocity,
    avg_clustering,
    degree_assortativity,
    degree_distribution,
    local_clustering,
    transitivity,
)
from .operators.triangles import (
    four_profile,
    per_vertex_triangles,
    triangle_count,
    triangle_count_sampled,
)
from .operators.wl import wl_colors, wl_graph_hash
from .operators.walks import (
    node2vec_walks,
    random_walks,
    weighted_random_walks,
)
from .session import get_spark
from .sources.rmat import rmat_edges
from .sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed_edges,
)

# Public surface mirrors the reference's exports (grandiso/__init__.py:
# find_motifs, find_motifs_iter, get_next_backbone_candidates,
# uniform_node_interestingness) — expand_step is the single-step
# expansion API in place of get_next_backbone_candidates (SURVEY §3.3) —
# plus the analytics / training-data operators the reference lacks.
__all__ = [
    "HostGraph",
    "bigram_logprob",
    "bigram_model",
    "chunk_documents",
    "double_sweep",
    "edge_betweenness",
    "four_profile",
    "heaps_fit",
    "bpe_encode",
    "bpe_merges",
    "bpe_vocab",
    "landmark_distances",
    "local_community",
    "lm_quality_buckets",
    "maximal_matching",
    "mixture_sample",
    "mixture_weights",
    "neighbor_sample",
    "onion_layers",
    "pack_sequences",
    "pack_stats",
    "partition_agreement",
    "seeded_label_propagation",
    "sparsify_similarity",
    "token_ids",
    "triangle_count_sampled",
    "unigram_logprob",
    "user_activity_features",
    "vertex_cover_2approx",
    "vocab_table",
    "zipf_fit",

    "Motif",
    "asof_join",
    "attribute_assortativity",
    "avg_clustering",
    "betweenness_centrality",
    "bfs_levels",
    "bipartite_project",
    "bm25_topk",
    "closeness_centrality",
    "cms_build",
    "cms_heavy_hitters",
    "cms_query",
    "compile_plan",
    "coarsen_graph",
    "connected_components",
    "connected_components_star",
    "core_number",
    "curate_corpus",
    "dataset_split",
    "degree_assortativity",
    "degree_distribution",
    "drop_bucketed",
    "earliest_arrival",
    "read_bucketed",
    "write_bucketed_edges",
    "eccentricity",
    "ego_net",
    "eigenvector_centrality",
    "embedding_clusters",
    "event_rollup",
    "effective_diameter",
    "expand_step",
    "hyperball",
    "hyperball_centralities",
    "hypertable_rollup",
    "interval_join",
    "neighborhood_function",
    "feature_propagation",
    "find_motifs",
    "greedy_coloring",
    "find_motifs_df",
    "funnel",
    "find_motifs_iter",
    "get_spark",
    "harmonic_centrality",
    "hits",
    "k_core",
    "k_truss",
    "katz_centrality",
    "label_propagation",
    "link_prediction_scores",
    "local_clustering",
    "longest_path_levels",
    "link_training_pairs",
    "maximal_independent_set",
    "minhash_neighbor_signatures",
    "minimum_spanning_forest",
    "modularity",
    "neighbor_similarity_pairs",
    "partition_quality",
    "neighbor_mean_features",
    "node2vec_walks",
    "pagerank",
    "personalized_pagerank",
    "per_vertex_triangles",
    "pmi_pairs",
    "skipgram_pairs",
    "random_walks",
    "reciprocity",
    "rmat_edges",
    "retention_cohorts",
    "robust_outliers",
    "sssp",
    "stratified_sample",
    "strongly_connected_components",
    "tfidf_terms",
    "top_transitions_per_user",
    "transitivity",
    "user_running_totals",
    "weighted_random_walks",
    "wl_colors",
    "wl_graph_hash",
    "triangle_count",
    "truss_number",
    "two_hop_counts",
    "uniform_node_interestingness",
]
