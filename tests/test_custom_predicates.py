"""P4 — caller-replaceable matching predicates
(/root/reference/grandiso/__init__.py:120-122, :363-365, :436-438).

The reference swaps per-pair Python callables; here each replacement is
a Column factory evaluated JVM-side during expansion (escape hatch: a
vectorized pandas_udf), so semantics are checked against hand-computed
counts on small fixtures plus a "predicate = default" equivalence on a
random host.
"""

import networkx as nx
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.match import find_motifs
from grandiso_networkx_spark.sources.nx_adapter import nx_to_host, nx_to_motif


def _tri(cls=nx.Graph):
    g = cls()
    nx.add_path(g, ["a", "b", "c", "a"])
    return g


class TestNodeAttrPredicate:
    def test_accept_all_overrides_attr_mismatch(self, spark):
        # Default subset-match finds nothing (wrong attr value);
        # an always-true node predicate restores the unconstrained count.
        host = _tri()
        nx.set_node_attributes(host, {"a": "x", "b": "x", "c": "x"}, "kind")
        motif = _tri()
        nx.set_node_attributes(motif, {"a": "y"}, "kind")
        h = nx_to_host(spark, host)
        assert find_motifs(motif, h, count_only=True) == 0
        got = find_motifs(
            motif,
            h,
            count_only=True,
            is_node_attr_match=lambda n, attrs, col: F.lit(True),
        )
        assert got == 6  # all automorphic triangle images

    def test_custom_attr_rule(self, spark):
        # Predicate that checks a *different* attribute than the motif's.
        host = _tri()
        nx.set_node_attributes(host, {"a": "ok", "b": "ok", "c": "no"}, "flag")
        motif = nx.Graph([("u", "v")])
        h = nx_to_host(spark, host)
        got = find_motifs(
            motif,
            h,
            count_only=True,
            # nx-loaded attrs are repr-encoded (nx_adapter docstring).
            is_node_attr_match=lambda n, attrs, col: F.element_at(
                col, F.lit("flag")
            ).eqNullSafe(F.lit(repr("ok"))),
        )
        # Edges among {a,b,c} with both endpoints flagged ok: only a-b,
        # counted in both orientations.
        assert got == 2


class TestStructuralPredicate:
    def test_tighter_degree_bound(self, spark):
        # Star S3: center degree 3, leaves degree 1.  A->B path motif
        # with a custom bound host_deg >= motif_deg + 1 keeps only
        # bindings where both images have degree >= 2 — impossible on a
        # star, so 0; default finds 6 (3 leaves x 2 orientations).
        host = nx.star_graph(3)
        motif = nx.Graph([("A", "B")])
        h = nx_to_host(spark, host)
        assert find_motifs(motif, h, count_only=True) == 6
        got = find_motifs(
            motif,
            h,
            count_only=True,
            is_node_structural_match=lambda n, d, deg_col: deg_col >= F.lit(d + 1),
        )
        assert got == 0

    def test_pandas_udf_escape_hatch(self, spark):
        # Vectorized Arrow-batched predicate over the degree table —
        # the "custom Python logic" path without per-row UDFs.
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def deg_ge_2(d: pd.Series) -> pd.Series:
            return d >= 2

        host = nx.star_graph(3)
        motif = nx.Graph([("A", "B")])
        got = find_motifs(
            nx_to_motif(motif),
            nx_to_host(spark, host),
            count_only=True,
            is_node_structural_match=lambda n, d, deg_col: deg_ge_2(deg_col),
        )
        assert got == 0


class TestEdgeAttrPredicate:
    def test_accept_all_overrides_edge_mismatch(self, spark):
        host = _tri()
        nx.set_edge_attributes(host, "solid", "style")
        motif = nx.Graph([("u", "v", {"style": "dashed"})])
        h = nx_to_host(spark, host)
        assert find_motifs(motif, h, count_only=True) == 0
        got = find_motifs(
            motif,
            h,
            count_only=True,
            is_edge_attr_match=lambda e, attrs, col: F.lit(True),
        )
        assert got == 6  # 3 edges x 2 orientations

    def test_default_equivalence_on_random_host(self, spark):
        # Supplying the default semantics as explicit predicates must
        # not change any count (plumbing correctness).
        from grandiso_networkx_spark.graph import attrs_subset_predicate

        host = nx.fast_gnp_random_graph(9, 0.35, seed=11)
        motif = nx.Graph([("x", "y"), ("y", "z")])
        h = nx_to_host(spark, host)
        base = find_motifs(motif, h, count_only=True)
        got = find_motifs(
            motif,
            h,
            count_only=True,
            is_node_attr_match=lambda n, attrs, col: attrs_subset_predicate(
                col, attrs
            ),
            is_node_structural_match=lambda n, d, deg_col: deg_col >= F.lit(d),
            is_edge_attr_match=lambda e, attrs, col: attrs_subset_predicate(
                col, attrs
            ),
        )
        assert got == base > 0
