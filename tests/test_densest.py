"""Densest subgraph (Bahmani greedy peel): python replay + brute-force
optimality bound on small graphs."""

import itertools

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.kcore import densest_subgraph


def _replay(g, eps):
    """Pure-python Bahmani peel on an nx.Graph — the exact semantics
    the Spark loop must reproduce (whole degree classes peel together)."""
    g = nx.Graph(g)
    g.remove_edges_from(nx.selfloop_edges(g))
    best, best_d = set(), -1.0
    while g.number_of_nodes():
        nv, ne = g.number_of_nodes(), g.number_of_edges()
        d = ne / nv
        if d > best_d:
            best_d, best = d, set(g.nodes())
        thresh = 2.0 * (1.0 + eps) * d
        low = [v for v, dv in g.degree() if dv <= thresh]
        g.remove_nodes_from(low)
    return best, best_d


def _brute_optimal(g):
    nodes = list(g.nodes())
    best = 0.0
    for r in range(1, len(nodes) + 1):
        for sub in itertools.combinations(nodes, r):
            sg = g.subgraph(sub)
            best = max(best, sg.number_of_edges() / len(sub))
    return best


def _run(spark, g, eps=0.1):
    edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
    out = densest_subgraph(edges, eps=eps).collect()
    vs = {r.id for r in out}
    dens = {r.density for r in out}
    assert len(dens) <= 1
    return vs, (dens.pop() if dens else None)


class TestDensestSubgraph:
    def test_clique_with_tail(self, spark):
        g = nx.complete_graph(5)
        g.add_edges_from([(4, 10), (10, 11), (11, 12)])
        vs, d = _run(spark, g)
        want_vs, want_d = _replay(g, 0.1)
        assert vs == want_vs and d == pytest.approx(want_d)
        # the clique is the optimum here; greedy must find >= half of it
        assert d >= _brute_optimal(g) / (2 * 1.1) - 1e-9

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_replay_and_bound(self, spark, seed):
        g = nx.gnp_random_graph(10, 0.35, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        if g.number_of_edges() == 0:
            pytest.skip("empty fixture")
        vs, d = _run(spark, g)
        want_vs, want_d = _replay(g, 0.1)
        assert vs == want_vs and d == pytest.approx(want_d)
        assert d >= _brute_optimal(g) / (2 * 1.1) - 1e-9

    def test_directed_input_symmetrized(self, spark):
        g = nx.complete_graph(4)
        edges = spark.createDataFrame(
            [(u, v) for u, v in g.edges()], "src long, dst long"
        )
        out = densest_subgraph(edges, eps=0.0).collect()
        assert {r.id for r in out} == set(range(4))
        assert out[0].density == pytest.approx(6 / 4)

    def test_empty_graph(self, spark):
        edges = spark.createDataFrame([], "src long, dst long")
        assert densest_subgraph(edges).count() == 0
