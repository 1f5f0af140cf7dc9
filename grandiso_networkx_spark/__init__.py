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
from .operators.frontier import expand_step
from .operators.match import find_motifs, find_motifs_df, find_motifs_iter
from .session import get_spark

# Public surface mirrors the reference's exports (grandiso/__init__.py:
# find_motifs, find_motifs_iter, get_next_backbone_candidates,
# uniform_node_interestingness) — expand_step is the single-step
# expansion API in place of get_next_backbone_candidates (SURVEY §3.3).
__all__ = [
    "HostGraph",
    "Motif",
    "compile_plan",
    "expand_step",
    "find_motifs",
    "find_motifs_df",
    "find_motifs_iter",
    "get_spark",
    "uniform_node_interestingness",
]
