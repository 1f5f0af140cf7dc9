"""SimRank: fixed-round numpy-replica differential (bit-level modulo
float noise), convergence vs networkx.simrank_similarity, symmetry,
and the truncation guard."""

import networkx as nx
import numpy as np
import pytest


def _numpy_simrank(edge_list, nodes, rounds, c, neighbors="in"):
    """Fixed-round replica of the recurrence from the identity start."""
    idx = {v: k for k, v in enumerate(nodes)}
    n = len(nodes)
    pred = [[] for _ in range(n)]
    for u, v in set(edge_list):
        if neighbors == "in":
            pred[idx[v]].append(idx[u])
        else:
            pred[idx[u]].append(idx[v])
    s = np.eye(n)
    for _ in range(rounds):
        new = np.zeros((n, n))
        for a in range(n):
            for b in range(n):
                if a == b:
                    new[a, b] = 1.0
                elif pred[a] and pred[b]:
                    acc = sum(s[i, j] for i in pred[a] for j in pred[b])
                    new[a, b] = c * acc / (len(pred[a]) * len(pred[b]))
        s = new
    return s, idx


def _spark_simrank(spark, edge_list, **kw):
    from grandiso_networkx_spark.operators.simrank import simrank

    edges = spark.createDataFrame(
        [(str(u), str(v)) for u, v in edge_list], "src string, dst string"
    )
    return {
        (r.a, r.b): r.similarity for r in simrank(edges, **kw).collect()
    }


class TestSimrankFixedRounds:
    @pytest.mark.parametrize("neighbors", ["in", "out"])
    def test_matches_numpy_replica(self, spark, neighbors):
        g = nx.gnp_random_graph(14, 0.2, seed=3, directed=True)
        el = list(g.edges())
        nodes = sorted({str(x) for e in el for x in e})
        got = _spark_simrank(spark, el, rounds=4, neighbors=neighbors)
        want, idx = _numpy_simrank(
            [(str(u), str(v)) for u, v in el], nodes, 4, 0.9, neighbors
        )
        for a in nodes:
            for b in nodes:
                assert got.get((a, b), 0.0) == pytest.approx(
                    want[idx[a], idx[b]], abs=1e-12
                )

    def test_symmetric_and_bounded(self, spark):
        g = nx.gnp_random_graph(12, 0.25, seed=8, directed=True)
        got = _spark_simrank(spark, list(g.edges()), rounds=3)
        for (a, b), s in got.items():
            assert s == pytest.approx(got[(b, a)])
            assert 0.0 <= s <= 1.0 + 1e-12


class TestSimrankVsNetworkx:
    def test_converges_to_networkx_undirected(self, spark):
        g = nx.gnp_random_graph(10, 0.3, seed=5)  # undirected
        el = [(u, v) for u, v in g.edges()] + [(v, u) for u, v in g.edges()]
        got = _spark_simrank(
            spark, el, rounds=25, importance_factor=0.6
        )
        want = nx.simrank_similarity(
            g, importance_factor=0.6, max_iterations=2000, tolerance=1e-9
        )
        for u in g.nodes():
            for v in g.nodes():
                assert got.get((str(u), str(v)), 0.0) == pytest.approx(
                    want[u][v], abs=1e-3
                )

    def test_converges_to_networkx_directed(self, spark):
        """networkx scores DiGraphs by predecessor neighborhoods —
        the paper's in-neighbor definition, this operator's default."""
        g = nx.gnp_random_graph(10, 0.25, seed=11, directed=True)
        got = _spark_simrank(
            spark,
            list(g.edges()),
            rounds=25,
            importance_factor=0.6,
            neighbors="in",
        )
        want = nx.simrank_similarity(
            g, importance_factor=0.6, max_iterations=2000, tolerance=1e-9
        )
        for u in g.nodes():
            for v in g.nodes():
                assert got.get((str(u), str(v)), 0.0) == pytest.approx(
                    want[u][v], abs=1e-3
                )


class TestSimrankGuards:
    def test_min_score_truncation_only_undercuts(self, spark):
        g = nx.gnp_random_graph(12, 0.25, seed=2, directed=True)
        el = list(g.edges())
        exact = _spark_simrank(spark, el, rounds=4)
        trunc = _spark_simrank(spark, el, rounds=4, min_score=0.05)
        for k, s in trunc.items():
            assert s <= exact[k] + 1e-12
        # diagonal survives any threshold
        nodes = {a for a, _ in exact}
        for a in nodes:
            assert trunc[(a, a)] == 1.0

    def test_bad_neighbors_raises(self, spark):
        from grandiso_networkx_spark.operators.simrank import simrank

        edges = spark.createDataFrame(
            [("0", "1")], "src string, dst string"
        )
        with pytest.raises(ValueError):
            simrank(edges, neighbors="sideways")
