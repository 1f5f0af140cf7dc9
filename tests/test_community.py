"""Partition quality vs networkx: modularity exactly
(nx.algorithms.community.modularity), conductance per community
(nx.algorithms.cuts.conductance), weighted + unweighted."""

import networkx as nx
import pytest
from networkx.algorithms import community as nxc
from networkx.algorithms.cuts import conductance as nx_conductance

from grandiso_networkx_spark.operators.community import (
    modularity,
    partition_quality,
)


def _fixture(spark, weighted: bool, seed: int = 9):
    g = nx.gnp_random_graph(30, 0.15, seed=seed)
    if weighted:
        for i, (u, v) in enumerate(g.edges()):
            g[u][v]["weight"] = 1.0 + (i % 5) * 0.5
    rows = [
        (str(u), str(v), float(g[u][v].get("weight", 1.0)))
        for u, v in g.edges()
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, weight double")
    labels = spark.createDataFrame(
        [(str(n), f"c{n % 3}") for n in g.nodes()], "id string, label string"
    )
    parts = [
        {n for n in g.nodes() if n % 3 == k} for k in range(3)
    ]
    return g, edges, labels, parts


class TestModularity:
    @pytest.mark.parametrize("weighted", [False, True])
    def test_vs_networkx(self, spark, weighted):
        g, edges, labels, parts = _fixture(spark, weighted)
        wc = "weight" if weighted else None
        (row,) = modularity(edges, labels, weight_col=wc).collect()
        want = nxc.modularity(
            g, parts, weight="weight" if weighted else None
        )
        assert abs(row.modularity - want) < 1e-6

    def test_resolution(self, spark):
        g, edges, labels, parts = _fixture(spark, False)
        (row,) = modularity(edges, labels, resolution=2.0).collect()
        want = nxc.modularity(g, parts, weight=None, resolution=2.0)
        assert abs(row.modularity - want) < 1e-6

    def test_empty_edges_raises(self, spark):
        edges = spark.createDataFrame([], "src string, dst string")
        labels = spark.createDataFrame([("a", "c0")], "id string, label string")
        with pytest.raises(ValueError):
            modularity(edges, labels)


class TestPartitionQuality:
    def test_conductance_and_volume(self, spark):
        g, edges, labels, parts = _fixture(spark, True)
        got = {
            r.label: r
            for r in partition_quality(
                edges, labels, weight_col="weight"
            ).collect()
        }
        for k, part in enumerate(parts):
            rest = set(g.nodes()) - part
            want_c = nx_conductance(g, part, rest, weight="weight")
            r = got[f"c{k}"]
            assert r.n_vertices == len(part)
            assert abs(r.conductance - want_c) < 1e-5, k
            want_vol = sum(
                d for _, d in g.degree(part, weight="weight")
            )
            assert abs(r.volume - want_vol) < 1e-5
            assert abs(2 * r.internal_w + r.cut_w - r.volume) < 1e-5

    def test_whole_graph_community_null_conductance(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        labels = spark.createDataFrame(
            [("a", "all"), ("b", "all"), ("c", "all")],
            "id string, label string",
        )
        (row,) = partition_quality(edges, labels).collect()
        assert row.cut_w == 0.0 and row.conductance is None
