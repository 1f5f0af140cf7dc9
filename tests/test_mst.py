"""Minimum spanning forest vs networkx oracle (minimum_spanning_edges)."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.mst import minimum_spanning_forest


def _edges_df(spark, g):
    rows = [(str(u), str(v), float(d["weight"])) for u, v, d in g.edges(data=True)]
    return spark.createDataFrame(rows, "src string, dst string, weight double")


def _got(spark, g):
    return {
        (r.src, r.dst): r.weight
        for r in minimum_spanning_forest(_edges_df(spark, g)).collect()
    }


def _nx_forest(g):
    return {
        tuple(sorted((str(u), str(v)))): float(d["weight"])
        for u, v, d in nx.minimum_spanning_edges(g, algorithm="boruvka")
    }


class TestMST:
    @pytest.mark.parametrize("seed", [7, 23])
    def test_random_distinct_weights(self, spark, seed):
        # distinct weights -> the minimum spanning forest is unique,
        # so the edge sets must match exactly.
        import random

        rnd = random.Random(seed)
        g = nx.fast_gnp_random_graph(30, 0.15, seed=seed)
        weights = rnd.sample(range(1, 10_000), g.number_of_edges())
        for w, (u, v) in zip(weights, g.edges()):
            g[u][v]["weight"] = w
        assert _got(spark, g) == _nx_forest(g)

    def test_disconnected_forest(self, spark):
        g = nx.union(nx.cycle_graph(5), nx.path_graph(4), rename=("a", "b"))
        for i, (u, v) in enumerate(g.edges()):
            g[u][v]["weight"] = 10 + 3 * i
        got = _got(spark, g)
        assert got == _nx_forest(g)
        # spanning forest: |edges| = |V| - #components
        assert len(got) == g.number_of_nodes() - 2

    def test_weight_ties_same_total(self, spark):
        # All weights equal: any spanning tree is minimal; check total
        # weight + tree validity instead of the exact edge set.
        g = nx.karate_club_graph()
        for u, v in g.edges():
            g[u][v]["weight"] = 1.0
        got = _got(spark, g)
        assert len(got) == g.number_of_nodes() - 1
        assert sum(got.values()) == sum(_nx_forest(g).values())
        t = nx.Graph(list(got))
        assert nx.is_tree(t) and t.number_of_nodes() == g.number_of_nodes()

    def test_gradient_chain(self, spark):
        # Gradient weights force long Boruvka merge chains (every
        # component's min edge points to the next) — the star-contract
        # merge must still converge in O(log) rounds.
        g = nx.path_graph(40)
        for i, (u, v) in enumerate(g.edges()):
            g[u][v]["weight"] = float(i + 1)
        assert _got(spark, g) == _nx_forest(g)

    def test_parallel_and_self_edges(self, spark):
        rows = [
            ("a", "b", 5.0),
            ("b", "a", 3.0),  # parallel, cheaper
            ("b", "c", 2.0),
            ("c", "c", 0.5),  # self-loop dropped
            ("a", "c", 9.0),
        ]
        df = spark.createDataFrame(rows, "src string, dst string, weight double")
        got = {
            (r.src, r.dst): r.weight
            for r in minimum_spanning_forest(df).collect()
        }
        assert got == {("a", "b"): 3.0, ("b", "c"): 2.0}
