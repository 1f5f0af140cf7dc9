"""Strongly connected components vs networkx."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.scc import strongly_connected_components


def _want(g):
    out = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp, key=str)
        for v in comp:
            out[str(v)] = str(m)
    return out


def _got(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    df = spark.createDataFrame(rows, "src string, dst string")
    return {
        r["id"]: r["component"]
        for r in strongly_connected_components(df).collect()
    }


def test_scc_two_cycles_and_bridge(spark):
    g = nx.DiGraph(
        [("a", "b"), ("b", "c"), ("c", "a"),  # cycle 1
         ("c", "d"),                           # bridge
         ("d", "e"), ("e", "d"),               # cycle 2
         ("e", "f")]                           # tail
    )
    assert _got(spark, g) == _want(g)


def test_scc_dag_is_all_singletons(spark):
    g = nx.DiGraph([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = _got(spark, g)
    assert got == {v: v for v in "abcd"}


def test_scc_self_loop_vertex(spark):
    g = nx.DiGraph([("a", "a"), ("a", "b")])
    assert _got(spark, g) == {"a": "a", "b": "b"}


@pytest.mark.parametrize("seed", [3, 8, 21])
def test_scc_random_digraphs(spark, seed):
    g = nx.fast_gnp_random_graph(16, 0.15, seed=seed, directed=True)
    if g.number_of_edges() == 0:
        pytest.skip("empty draw")
    assert _got(spark, g) == _want(g)
