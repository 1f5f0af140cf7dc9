"""Graph statistics vs networkx oracles."""

import math

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.stats import (
    avg_clustering,
    degree_assortativity,
    degree_distribution,
    local_clustering,
    transitivity,
)


def _df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


def _graphs():
    yield nx.karate_club_graph()
    yield nx.fast_gnp_random_graph(20, 0.25, seed=11)
    yield nx.path_graph(6)


@pytest.mark.parametrize("gi", [0, 1, 2])
def test_degree_distribution(spark, gi):
    g = list(_graphs())[gi]
    got = {
        r["deg"]: r["n_vertices"]
        for r in degree_distribution(_df(spark, g)).collect()
    }
    want = {}
    for _, d in g.degree():
        if d > 0:
            want[d] = want.get(d, 0) + 1
    assert got == want


@pytest.mark.parametrize("gi", [0, 1, 2])
def test_transitivity(spark, gi):
    g = list(_graphs())[gi]
    got = transitivity(_df(spark, g)).collect()[0]["transitivity"]
    assert math.isclose(got, nx.transitivity(g), abs_tol=1e-12)


@pytest.mark.parametrize("gi", [0, 1])
def test_avg_clustering(spark, gi):
    g = list(_graphs())[gi]
    got = avg_clustering(_df(spark, g)).collect()[0]["avg_clustering"]
    assert math.isclose(got, nx.average_clustering(g), abs_tol=1e-12)


@pytest.mark.parametrize("gi", [0, 1, 2])
def test_local_clustering(spark, gi):
    g = list(_graphs())[gi]
    got = {
        r.id: r.clustering
        for r in local_clustering(_df(spark, g)).collect()
    }
    want = nx.clustering(g)
    assert set(got) == {str(k) for k in want if g.degree(k) > 0}
    for k, v in want.items():
        if g.degree(k) > 0:
            assert math.isclose(got[str(k)], v, abs_tol=1e-12), k


def test_local_clustering_self_loops_dropped(spark):
    g = nx.karate_club_graph()
    rows = [(str(u), str(v)) for u, v in g.edges()] + [("0", "0")]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {r.id: r.clustering for r in local_clustering(df).collect()}
    want = nx.clustering(g)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-12), k


@pytest.mark.parametrize("gi", [0, 1])
def test_degree_assortativity(spark, gi):
    import numpy as np

    g = list(_graphs())[gi]
    got = degree_assortativity(_df(spark, g)).collect()[0]["assortativity"]
    # Pearson corr of (deg(u), deg(v)) over both orientations — what
    # nx.degree_pearson_correlation_coefficient computes (its impl
    # needs scipy, absent here).
    du, dv = [], []
    d = dict(g.degree())
    for u, v in g.edges():
        du += [d[u], d[v]]
        dv += [d[v], d[u]]
    want = float(np.corrcoef(du, dv)[0, 1])
    assert math.isclose(got, want, abs_tol=1e-9)
