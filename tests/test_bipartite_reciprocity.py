"""Bipartite projection vs nx.bipartite.weighted_projected_graph;
reciprocity vs nx.overall_reciprocity."""

import networkx as nx
import pytest
from networkx.algorithms import bipartite as nxb

from grandiso_networkx_spark.operators.bipartite import bipartite_project
from grandiso_networkx_spark.operators.stats import reciprocity


class TestBipartiteProject:
    def test_vs_networkx(self, spark):
        g = nx.Graph()
        users = [f"u{i}" for i in range(8)]
        items = [f"i{j}" for j in range(5)]
        rng_edges = [
            (u, items[(i * 3 + j) % 5])
            for i, u in enumerate(users)
            for j in range(1 + i % 3)
        ]
        g.add_edges_from(rng_edges)
        df = spark.createDataFrame(rng_edges, "src string, dst string")
        got = {
            tuple(sorted((r.a, r.b))): r.weight
            for r in bipartite_project(df, max_item_degree=None).collect()
        }
        proj = nxb.weighted_projected_graph(g, users)
        want = {
            tuple(sorted((u, v))): d["weight"]
            for u, v, d in proj.edges(data=True)
        }
        assert got == want

    def test_hub_guard_drops_boilerplate_item(self, spark):
        rows = [(f"u{i}", "hub") for i in range(6)] + [
            ("u0", "rare"),
            ("u1", "rare"),
        ]
        df = spark.createDataFrame(rows, "src string, dst string")
        got = {
            (r.a, r.b): r.weight
            for r in bipartite_project(df, max_item_degree=3).collect()
        }
        # only the rare item survives -> single pair
        assert got == {("u0", "u1"): 1}

    def test_duplicate_edges_collapse(self, spark):
        rows = [("a", "x"), ("a", "x"), ("b", "x")]
        df = spark.createDataFrame(rows, "src string, dst string")
        (row,) = bipartite_project(df, max_item_degree=None).collect()
        assert (row.a, row.b, row.weight) == ("a", "b", 1)


class TestReciprocity:
    def test_vs_networkx(self, spark):
        g = nx.fast_gnp_random_graph(25, 0.1, directed=True, seed=13)
        g.remove_edges_from(nx.selfloop_edges(g))
        df = spark.createDataFrame(
            [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
        )
        (row,) = reciprocity(df).collect()
        assert abs(row.reciprocity - nx.overall_reciprocity(g)) < 1e-9

    def test_fully_reciprocal_and_none(self, spark):
        df1 = spark.createDataFrame(
            [("a", "b"), ("b", "a")], "src string, dst string"
        )
        (r1,) = reciprocity(df1).collect()
        assert r1.reciprocity == 1.0
        df2 = spark.createDataFrame([("a", "b")], "src string, dst string")
        (r2,) = reciprocity(df2).collect()
        assert r2.reciprocity == 0.0

    def test_empty_null(self, spark):
        df = spark.createDataFrame([], "src string, dst string")
        (row,) = reciprocity(df).collect()
        assert row.reciprocity is None


class TestBipartiteClustering:
    def _graph(self, seed):
        g = nx.bipartite.random_graph(9, 7, 0.4, seed=seed)
        left = [n for n, d in g.nodes(data=True) if d["bipartite"] == 0]
        right = [n for n in g.nodes() if n not in set(left)]
        edges = [(f"l{u}", f"r{v}") for u, v in g.edges()]
        return g, left, right, edges

    def test_vs_networkx_all_modes(self, spark):
        from grandiso_networkx_spark.operators.bipartite import (
            bipartite_clustering,
        )

        g, left, right, edges = self._graph(seed=4)
        df = spark.createDataFrame(edges, "src string, dst string")
        for mode in ("dot", "min", "max"):
            want_l = nxb.clustering(g, left, mode=mode)
            got_l = {
                r.id: r.clustering
                for r in bipartite_clustering(df, "left", mode).collect()
            }
            for u in left:
                if f"l{u}" in got_l:  # isolated nx nodes have no edges here
                    assert got_l[f"l{u}"] == pytest.approx(want_l[u])
            want_r = nxb.clustering(g, right, mode=mode)
            got_r = {
                r.id: r.clustering
                for r in bipartite_clustering(df, "right", mode).collect()
            }
            for v in right:
                if f"r{v}" in got_r:
                    assert got_r[f"r{v}"] == pytest.approx(want_r[v])

    def test_no_second_order_neighbors_is_zero(self, spark):
        from grandiso_networkx_spark.operators.bipartite import (
            bipartite_clustering,
        )

        df = spark.createDataFrame(
            [("a", "x"), ("b", "y")], "src string, dst string"
        )
        got = {
            r.id: r.clustering
            for r in bipartite_clustering(df, "left").collect()
        }
        assert got == {"a": 0.0, "b": 0.0}

    def test_bad_args_raise(self, spark):
        from grandiso_networkx_spark.operators.bipartite import (
            bipartite_clustering,
        )

        df = spark.createDataFrame([("a", "x")], "src string, dst string")
        with pytest.raises(ValueError):
            bipartite_clustering(df, side="middle")
        with pytest.raises(ValueError):
            bipartite_clustering(df, mode="geometric")
