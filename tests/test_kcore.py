"""k-core / core-number vs networkx oracles (nx.k_core, nx.core_number)."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.kcore import core_number, k_core


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string").distinct()


def _cores(spark, g):
    return {r.id: r.core for r in core_number(_edges_df(spark, g)).collect()}


def _nx_cores(g):
    return {str(k): v for k, v in nx.core_number(g).items()}


class TestCoreNumber:
    def test_path(self, spark):
        g = nx.path_graph(6)
        assert _cores(spark, g) == _nx_cores(g)

    def test_karate(self, spark):
        g = nx.karate_club_graph()
        assert _cores(spark, g) == _nx_cores(g)

    def test_clique_plus_tail(self, spark):
        # K5 with a pendant path — exercises the cascade where peeling
        # the tail strips a vertex's last edge without flagging it low.
        g = nx.complete_graph(5)
        g.add_edges_from([(4, 10), (10, 11), (11, 12)])
        assert _cores(spark, g) == _nx_cores(g)

    def test_two_components(self, spark):
        g = nx.union(nx.cycle_graph(4), nx.complete_graph(4), rename=("a", "b"))
        assert _cores(spark, g) == _nx_cores(g)

    def test_random(self, spark):
        g = nx.fast_gnp_random_graph(30, 0.15, seed=7)
        assert _cores(spark, g) == _nx_cores(g)

    def test_directed_orientation_ignored(self, spark):
        # Our semantics: undirected simple graph regardless of input
        # orientation; both stored orientations of the same pair count
        # once.
        g = nx.karate_club_graph()
        rows = [(str(u), str(v)) for u, v in g.edges()] + [
            (str(v), str(u)) for u, v in list(g.edges())[:20]
        ]
        e = spark.createDataFrame(rows, "src string, dst string")
        got = {r.id: r.core for r in core_number(e).collect()}
        assert got == _nx_cores(g)


class TestKCore:
    @pytest.mark.parametrize("k", [1, 2, 3, 4])
    def test_karate_k(self, spark, k):
        g = nx.karate_club_graph()
        got = {r.id: r.degree for r in k_core(_edges_df(spark, g), k).collect()}
        want = {str(n): d for n, d in nx.k_core(g, k).degree()}
        assert got == want

    def test_empty_core(self, spark):
        g = nx.path_graph(5)  # max core = 1
        assert k_core(_edges_df(spark, g), 3).count() == 0

    def test_negative_k(self, spark):
        g = nx.path_graph(3)
        with pytest.raises(ValueError):
            k_core(_edges_df(spark, g), -1)

    def test_self_loops_ignored(self, spark):
        g = nx.complete_graph(4)
        rows = [(str(u), str(v)) for u, v in g.edges()] + [("0", "0"), ("9", "9")]
        e = spark.createDataFrame(rows, "src string, dst string")
        got = {r.id: r.degree for r in k_core(e, 3).collect()}
        assert got == {str(n): d for n, d in nx.k_core(g, 3).degree()}
        # self-loop-only vertex: core 0, never in a k>=1 core
        cores = {r.id: r.core for r in core_number(e).collect()}
        assert cores["9"] == 0 and cores["0"] == 3


class TestKTruss:
    @pytest.mark.parametrize("k", [2, 3, 4, 5])
    def test_karate_k(self, spark, k):
        from grandiso_networkx_spark.operators.kcore import k_truss

        g = nx.karate_club_graph()
        got = {
            (r.src, r.dst) for r in k_truss(_edges_df(spark, g), k).collect()
        }
        want = {
            tuple(sorted((str(u), str(v))))
            for u, v in nx.k_truss(g, k).edges()
        }
        assert got == want

    @pytest.mark.parametrize("seed", [3, 17])
    def test_random(self, spark, seed):
        from grandiso_networkx_spark.operators.kcore import k_truss

        g = nx.fast_gnp_random_graph(25, 0.25, seed=seed)
        for k in (3, 4):
            got = {
                (r.src, r.dst)
                for r in k_truss(_edges_df(spark, g), k).collect()
            }
            want = {
                tuple(sorted((str(u), str(v))))
                for u, v in nx.k_truss(g, k).edges()
            }
            assert got == want, k

    def test_cascade(self, spark):
        from grandiso_networkx_spark.operators.kcore import k_truss

        # Two triangles sharing an edge + a pendant triangle chain:
        # peeling one round exposes newly under-supported edges.
        g = nx.Graph(
            [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3), (3, 4), (4, 5), (3, 5)]
        )
        got = {
            (r.src, r.dst) for r in k_truss(_edges_df(spark, g), 4).collect()
        }
        want = {
            tuple(sorted((str(u), str(v))))
            for u, v in nx.k_truss(g, 4).edges()
        }
        assert got == want

    def test_invalid_k(self, spark):
        from grandiso_networkx_spark.operators.kcore import k_truss

        g = nx.path_graph(3)
        with pytest.raises(ValueError):
            k_truss(_edges_df(spark, g), 1)
