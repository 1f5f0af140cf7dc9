"""Katz + closeness centrality vs networkx oracles (SURVEY.md §2.6
class — link-analysis ops beside PageRank/HITS/bfs_levels)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.closeness import (
    closeness_centrality,
    distance_profile,
    eccentricity,
    harmonic_centrality,
)
from grandiso_networkx_spark.operators.eigenvector import (
    eigenvector_centrality,
)
from grandiso_networkx_spark.operators.katz import katz_centrality


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string").distinct()


class TestKatz:
    @pytest.mark.parametrize("seed", [3, 17])
    def test_directed_random(self, spark, seed):
        g = nx.fast_gnp_random_graph(40, 0.08, directed=True, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))  # edge-table graphs
        got = {
            r.id: r.katz
            for r in katz_centrality(_edges_df(spark, g), tol=1e-10).collect()
        }
        want = nx.katz_centrality(g, tol=1e-10)
        assert set(got) == {str(k) for k in want}
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-6, k

    def test_weighted(self, spark):
        g = nx.DiGraph()
        g.add_weighted_edges_from(
            [("a", "b", 2.0), ("b", "c", 0.5), ("c", "a", 1.5), ("a", "c", 3.0)]
        )
        df = spark.createDataFrame(
            [(u, v, d["weight"]) for u, v, d in g.edges(data=True)],
            "src string, dst string, weight double",
        )
        got = {
            r.id: r.katz
            for r in katz_centrality(df, weight_col="weight", tol=1e-10).collect()
        }
        want = nx.katz_centrality(g, weight="weight", tol=1e-10)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6, k

    def test_fixed_iterations_unnormalized_recurrence(self, spark):
        # After k rounds from x0=0, x = beta * sum_{i<=k-1} (alpha A^T)^i 1
        # — pin a tiny hand-computable case: path a->b, 2 rounds.
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        got = {
            r.id: r.katz
            for r in katz_centrality(
                df, alpha=0.5, fixed_iterations=2, normalized=False
            ).collect()
        }
        # round1: x=beta=1 everywhere; round2: x_b = 0.5*1 + 1 = 1.5.
        assert got == {"a": 1.0, "b": 1.5}

    def test_divergent_raises(self, spark):
        # alpha > 1/lambda_max on a cycle diverges -> no convergence.
        g = nx.cycle_graph(4, create_using=nx.DiGraph)
        with pytest.raises(RuntimeError):
            katz_centrality(_edges_df(spark, g), alpha=1.5, max_iter=30)


class TestEigenvector:
    @pytest.mark.parametrize("seed", [9, 31])
    def test_directed_random(self, spark, seed):
        g = nx.fast_gnp_random_graph(40, 0.1, directed=True, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            r.id: r.eigenvector
            for r in eigenvector_centrality(
                _edges_df(spark, g), max_iter=500, tol=1e-10
            ).collect()
        }
        want = nx.eigenvector_centrality(g, max_iter=500, tol=1e-10)
        assert set(got) == {str(k) for k in want}
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-6, k

    def test_undirected_symmetrized(self, spark):
        g = nx.karate_club_graph()
        rows = [(str(u), str(v)) for u, v in g.edges()] + [
            (str(v), str(u)) for u, v in g.edges()
        ]
        df = spark.createDataFrame(rows, "src string, dst string")
        got = {
            r.id: r.eigenvector
            for r in eigenvector_centrality(df, tol=1e-10).collect()
        }
        want = nx.eigenvector_centrality(g, tol=1e-10)
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-6, k

    def test_weighted(self, spark):
        g = nx.DiGraph()
        g.add_weighted_edges_from(
            [("a", "b", 2.0), ("b", "c", 0.5), ("c", "a", 1.5), ("a", "c", 3.0)]
        )
        df = spark.createDataFrame(
            [(u, v, d["weight"]) for u, v, d in g.edges(data=True)],
            "src string, dst string, weight double",
        )
        got = {
            r.id: r.eigenvector
            for r in eigenvector_centrality(
                df, weight_col="weight", tol=1e-10
            ).collect()
        }
        want = nx.eigenvector_centrality(g, weight="weight", tol=1e-10)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6, k

    def test_fixed_one_round_hand_case(self, spark):
        # path a->b, one round from x0 = (.5, .5):
        # y = (.5, 1.0), ||y|| = sqrt(1.25).
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        got = {
            r.id: r.eigenvector
            for r in eigenvector_centrality(df, fixed_iterations=1).collect()
        }
        n = (0.25 + 1.0) ** 0.5
        assert abs(got["a"] - 0.5 / n) < 1e-12
        assert abs(got["b"] - 1.0 / n) < 1e-12

    def test_nonconvergent_raises(self, spark):
        # 2-cycle power iteration oscillates around the fixed point but
        # converges with (A+I); force failure with max_iter=1 on a
        # graph that needs more.
        g = nx.fast_gnp_random_graph(20, 0.15, directed=True, seed=4)
        g.remove_nodes_from(list(nx.isolates(g)))
        with pytest.raises(RuntimeError):
            eigenvector_centrality(_edges_df(spark, g), max_iter=1, tol=1e-12)


class TestCloseness:
    @pytest.mark.parametrize("seed", [5, 23])
    def test_undirected_random(self, spark, seed):
        g = nx.fast_gnp_random_graph(35, 0.09, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            r.id: r.closeness
            for r in closeness_centrality(_edges_df(spark, g)).collect()
        }
        want = nx.closeness_centrality(g)
        assert set(got) == {str(k) for k in want}
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-9, k

    def test_directed_incoming_distance(self, spark):
        g = nx.fast_gnp_random_graph(30, 0.1, directed=True, seed=7)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            r.id: r.closeness
            for r in closeness_centrality(
                _edges_df(spark, g), directed=True
            ).collect()
        }
        want = nx.closeness_centrality(g)  # nx uses incoming distance
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-9, k

    def test_source_sample(self, spark):
        g = nx.path_graph(6)
        srcs = spark.createDataFrame([("0",), ("3",)], "id string")
        got = {
            r.id: r.closeness
            for r in closeness_centrality(_edges_df(spark, g), sources=srcs).collect()
        }
        want = nx.closeness_centrality(g)
        assert set(got) == {"0", "3"}
        for k in ("0", "3"):
            assert abs(got[k] - want[int(k)]) < 1e-9

    @pytest.mark.parametrize("directed", [False, True])
    def test_harmonic_random(self, spark, directed):
        g = nx.fast_gnp_random_graph(30, 0.1, directed=directed, seed=11)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            r.id: r.harmonic
            for r in harmonic_centrality(
                _edges_df(spark, g), directed=directed
            ).collect()
        }
        want = nx.harmonic_centrality(g)
        assert set(got) == {str(k) for k in want}
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-9, k

    def test_harmonic_disconnected(self, spark):
        # two components: unreachable pairs contribute 0, no normalization.
        g = nx.union(nx.path_graph(3), nx.path_graph(2), rename=("a", "b"))
        got = {
            r.id: r.harmonic
            for r in harmonic_centrality(_edges_df(spark, g)).collect()
        }
        want = nx.harmonic_centrality(g)
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-9, k

    def test_eccentricity_undirected(self, spark):
        g = nx.karate_club_graph()
        got = {
            r.id: r.ecc for r in eccentricity(_edges_df(spark, g)).collect()
        }
        want = nx.eccentricity(g)
        assert got == {str(k): v for k, v in want.items()}

    def test_eccentricity_directed(self, spark):
        g = nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 2)])
        got = {
            r.id: r.ecc
            for r in eccentricity(_edges_df(spark, g), directed=True).collect()
        }
        want = nx.eccentricity(g)
        assert got == {str(k): v for k, v in want.items()}

    def test_eccentricity_disconnected_raises(self, spark):
        g = nx.union(nx.path_graph(3), nx.path_graph(2), rename=("a", "b"))
        with pytest.raises(RuntimeError):
            eccentricity(_edges_df(spark, g)).collect()
        # per-component reading when the guard is off
        got = {
            r.id: r.ecc
            for r in eccentricity(
                _edges_df(spark, g), require_connected=False
            ).collect()
        }
        assert got == {"a0": 2, "a1": 1, "a2": 2, "b0": 1, "b1": 1}

    def test_wf_improved_off(self, spark):
        g = nx.union(nx.path_graph(3), nx.path_graph(2, create_using=nx.Graph), rename=("a", "b"))
        got = {
            r.id: r.closeness
            for r in closeness_centrality(
                _edges_df(spark, g), wf_improved=False
            ).collect()
        }
        want = nx.closeness_centrality(g, wf_improved=False)
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-9, k


class TestDistanceProfile:
    """One multi-source BFS serving closeness + harmonic + eccentricity
    must equal the three standalone operators (and their nx oracles)."""

    def test_matches_all_three_nx(self, spark):
        g = nx.karate_club_graph()
        rows = {
            r.id: r for r in distance_profile(_edges_df(spark, g)).collect()
        }
        close = nx.closeness_centrality(g)
        harm = nx.harmonic_centrality(g)
        ecc = nx.eccentricity(g)
        assert set(rows) == {str(k) for k in close}
        for k in close:
            got = rows[str(k)]
            assert abs(got.closeness - close[k]) < 1e-9, k
            assert abs(got.harmonic - harm[k]) < 1e-9, k
            assert got.ecc == ecc[k], k

    def test_disconnected(self, spark):
        # Per-component semantics: WF-scaled closeness, harmonic sums
        # over reached only, eccentricity within the component.
        g = nx.union(nx.path_graph(3), nx.path_graph(2), rename=("a", "b"))
        rows = {
            r.id: r for r in distance_profile(_edges_df(spark, g)).collect()
        }
        close = nx.closeness_centrality(g)
        harm = nx.harmonic_centrality(g)
        for k in close:
            got = rows[str(k)]
            assert abs(got.closeness - close[k]) < 1e-9, k
            assert abs(got.harmonic - harm[k]) < 1e-9, k
        assert {k: r.ecc for k, r in rows.items()} == {
            "a0": 2, "a1": 1, "a2": 2, "b0": 1, "b1": 1
        }
