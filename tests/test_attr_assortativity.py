"""Categorical attribute assortativity vs
nx.attribute_assortativity_coefficient, directed + undirected +
degenerate single-category null."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.stats import attribute_assortativity


def _fixture(spark, directed: bool, seed: int = 4):
    g = nx.fast_gnp_random_graph(30, 0.12, directed=directed, seed=seed)
    g.remove_edges_from(nx.selfloop_edges(g))
    for n in g.nodes():
        g.nodes[n]["cat"] = f"k{n % 4}"
    edges = spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )
    attrs = spark.createDataFrame(
        [(str(n), g.nodes[n]["cat"]) for n in g.nodes()],
        "id string, cat string",
    )
    return g, edges, attrs


class TestAttributeAssortativity:
    @pytest.mark.parametrize("directed", [False, True])
    def test_vs_networkx(self, spark, directed):
        g, edges, attrs = _fixture(spark, directed)
        (row,) = attribute_assortativity(
            edges, attrs, directed=directed
        ).collect()
        want = nx.attribute_assortativity_coefficient(g, "cat")
        assert abs(row.attr_assortativity - want) < 1e-9

    def test_perfectly_assortative(self, spark):
        # two disjoint cliques, category = clique
        edges = spark.createDataFrame(
            [("a1", "a2"), ("a2", "a3"), ("b1", "b2")],
            "src string, dst string",
        )
        attrs = spark.createDataFrame(
            [(v, v[0]) for v in ("a1", "a2", "a3", "b1", "b2")],
            "id string, cat string",
        )
        (row,) = attribute_assortativity(edges, attrs).collect()
        assert abs(row.attr_assortativity - 1.0) < 1e-9

    def test_bipartite_disassortative(self, spark):
        g = nx.complete_bipartite_graph(3, 4)
        for n in g.nodes():
            g.nodes[n]["cat"] = "L" if n < 3 else "R"
        edges = spark.createDataFrame(
            [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
        )
        attrs = spark.createDataFrame(
            [(str(n), g.nodes[n]["cat"]) for n in g.nodes()],
            "id string, cat string",
        )
        (row,) = attribute_assortativity(edges, attrs).collect()
        want = nx.attribute_assortativity_coefficient(g, "cat")
        assert abs(row.attr_assortativity - want) < 1e-9

    def test_single_category_null(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        attrs = spark.createDataFrame(
            [(v, "same") for v in "abc"], "id string, cat string"
        )
        (row,) = attribute_assortativity(edges, attrs).collect()
        assert row.attr_assortativity is None
