"""Triad census vs nx.triadic_census (goldens + randomized differential)."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.triads import TRIAD_NAMES, triad_census


def _check(spark, g):
    edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
    want = nx.triadic_census(g)
    got = {r.triad: r.n_triads for r in triad_census(edges).collect()}
    assert set(got) == set(TRIAD_NAMES)
    assert got == want


class TestGoldens:
    def test_single_arc(self, spark):
        self._g = nx.DiGraph([(1, 2)])
        _check(spark, self._g)

    def test_mutual_pair_plus_spectator_arc(self, spark):
        _check(spark, nx.DiGraph([(1, 2), (2, 1), (3, 4)]))

    def test_directed_triangle_is_030C(self, spark):
        g = nx.DiGraph([(1, 2), (2, 3), (3, 1)])
        got = {
            r.triad: r.n_triads
            for r in triad_census(
                spark.createDataFrame(list(g.edges()), "src long, dst long")
            ).collect()
        }
        assert got["030C"] == 1
        assert sum(got.values()) == 1

    def test_transitive_triangle_is_030T(self, spark):
        g = nx.DiGraph([(1, 2), (2, 3), (1, 3)])
        _check(spark, g)

    def test_complete_mutual_is_300(self, spark):
        g = nx.DiGraph()
        for i in range(3):
            for j in range(3):
                if i != j:
                    g.add_edge(i, j)
        got = {
            r.triad: r.n_triads
            for r in triad_census(
                spark.createDataFrame(list(g.edges()), "src long, dst long")
            ).collect()
        }
        assert got["300"] == 1

    def test_out_star_021D_and_in_star_021U(self, spark):
        _check(spark, nx.DiGraph([(0, 1), (0, 2), (0, 3)]))
        _check(spark, nx.DiGraph([(1, 0), (2, 0), (3, 0)]))

    def test_path_021C(self, spark):
        _check(spark, nx.DiGraph([(1, 2), (2, 3)]))


class TestRandomDifferential:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_gnp_digraphs(self, spark, seed):
        g = nx.gnp_random_graph(12, 0.25, seed=seed, directed=True)
        g.remove_nodes_from(list(nx.isolates(g)))
        _check(spark, g)

    def test_denser_digraph(self, spark):
        g = nx.gnp_random_graph(9, 0.5, seed=11, directed=True)
        g.remove_nodes_from(list(nx.isolates(g)))
        _check(spark, g)

    def test_census_totals_c_n_3(self, spark):
        g = nx.gnp_random_graph(10, 0.3, seed=5, directed=True)
        g.remove_nodes_from(list(nx.isolates(g)))
        n = g.number_of_nodes()
        edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
        got = {r.triad: r.n_triads for r in triad_census(edges).collect()}
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6

    def test_motif_engine_cross_check(self, spark):
        """030C x3 = directed-triangle motif matches (|Aut| = 3)."""
        from grandiso_networkx_spark.graph import HostGraph
        from grandiso_networkx_spark.operators.match import find_motifs_df
        from grandiso_networkx_spark.plans.motif import Motif

        g = nx.gnp_random_graph(10, 0.35, seed=3, directed=True)
        edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
        census = {r.triad: r.n_triads for r in triad_census(edges).collect()}
        m = Motif(directed=True)
        m.add_edge("A", "B")
        m.add_edge("B", "C")
        m.add_edge("C", "A")
        host = HostGraph(edges, directed=True)
        # isomorphisms (induced): cyclic triangles with exactly those arcs
        from grandiso_networkx_spark.operators.match import find_motifs_df as fm

        iso = fm(m, host, isomorphisms_only=True).count()
        assert iso == 3 * census["030C"]
