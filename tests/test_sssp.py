"""Weighted SSSP vs networkx Dijkstra."""

import math

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.sssp import sssp


def _df(spark, g, weighted=True):
    if weighted:
        rows = [(str(u), str(v), float(d["w"])) for u, v, d in g.edges(data=True)]
        return spark.createDataFrame(rows, "src string, dst string, w double")
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


def _got(spark, g, source, **kw):
    return {
        r["id"]: r["dist"] for r in sssp(_df(spark, g), str(source), **kw).collect()
    }


def _rand_weighted(seed, directed=True):
    g = nx.fast_gnp_random_graph(14, 0.3, seed=seed, directed=directed)
    for i, (u, v) in enumerate(g.edges()):
        g[u][v]["w"] = ((i * 7919 + seed) % 50) / 10.0 + 0.1
    return g


@pytest.mark.parametrize("seed", [2, 9])
def test_sssp_matches_dijkstra_directed(spark, seed):
    g = _rand_weighted(seed)
    src = next(n for n in g if g.out_degree(n) > 0)
    want = nx.single_source_dijkstra_path_length(g, src, weight="w")
    got = _got(spark, g, src, weight_col="w", directed=True)
    assert set(got) == {str(n) for n in want}
    for k, d in got.items():
        assert math.isclose(d, want[int(k)], abs_tol=1e-9), (k, d, want[int(k)])


def test_sssp_undirected_unit_weights_is_bfs(spark):
    g = nx.path_graph(6)
    df = _df(spark, nx.DiGraph(g), weighted=False)
    got = {r["id"]: r["dist"] for r in sssp(df, "0", directed=False).collect()}
    want = nx.single_source_shortest_path_length(g, 0)
    assert got == {str(k): float(v) for k, v in want.items()}


def test_sssp_fixed_rounds_converges_at_diameter(spark):
    g = _rand_weighted(5)
    src = next(n for n in g if g.out_degree(n) > 0)
    want = nx.single_source_dijkstra_path_length(g, src, weight="w")
    got = _got(spark, g, src, weight_col="w", fixed_rounds=14)
    assert {k: round(v, 9) for k, v in got.items()} == {
        str(k): round(v, 9) for k, v in want.items()
    }


def test_sssp_negative_weight_raises(spark):
    g = nx.DiGraph()
    g.add_edge(0, 1, w=-1.0)
    with pytest.raises(ValueError):
        _got(spark, g, 0, weight_col="w")
