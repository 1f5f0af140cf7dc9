"""Brandes betweenness centrality vs networkx oracles (SURVEY.md §2.6
class).  Exact mode vs ``nx.betweenness_centrality``; sampled mode vs
a pure-python Brandes restricted to the same source set (nx's k-sample
draws its own random sources, so the subset oracle is hand-rolled with
nx's exact rescale)."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.betweenness import (
    betweenness_centrality,
)


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string").distinct()


def _py_brandes_subset(g, sources):
    """Per-source dependency sums (Brandes 2001), unscaled."""
    bc = dict.fromkeys(g, 0.0)
    for s in sources:
        stack, pred, sigma, dist = [], {v: [] for v in g}, dict.fromkeys(g, 0.0), {}
        sigma[s], dist[s] = 1.0, 0
        queue = [s]
        while queue:
            nxt = []
            for v in queue:
                stack.append(v)
                for w in g[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nxt.append(w)
                    if dist.get(w) == dist[v] + 1:
                        sigma[w] += sigma[v]
                        pred[w].append(v)
            # de-dup additions per level
            seen, uniq = set(), []
            for w in nxt:
                if w not in seen:
                    seen.add(w)
                    uniq.append(w)
            queue = uniq
        delta = dict.fromkeys(g, 0.0)
        for w in reversed(stack):
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


class TestExact:
    @pytest.mark.parametrize("seed", [2, 19])
    def test_undirected_normalized(self, spark, seed):
        g = nx.fast_gnp_random_graph(25, 0.12, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            r.id: r.betweenness
            for r in betweenness_centrality(_edges_df(spark, g)).collect()
        }
        want = nx.betweenness_centrality(g)
        assert set(got) == {str(k) for k in want}
        for k, v in want.items():
            assert abs(got[str(k)] - v) < 1e-9, k

    def test_directed(self, spark):
        g = nx.fast_gnp_random_graph(22, 0.12, directed=True, seed=4)
        g.remove_nodes_from(list(nx.isolates(g)))
        for norm in (True, False):
            got = {
                r.id: r.betweenness
                for r in betweenness_centrality(
                    _edges_df(spark, g), directed=True, normalized=norm
                ).collect()
            }
            want = nx.betweenness_centrality(g, normalized=norm)
            for k, v in want.items():
                assert abs(got[str(k)] - v) < 1e-9, (norm, k)

    def test_unnormalized_undirected_star(self, spark):
        g = nx.star_graph(5)  # center lies on all 10 leaf pairs
        got = {
            r.id: r.betweenness
            for r in betweenness_centrality(
                _edges_df(spark, g), normalized=False
            ).collect()
        }
        assert got["0"] == 10.0
        assert all(got[str(i)] == 0.0 for i in range(1, 6))


class TestSampled:
    def test_subset_matches_python_brandes(self, spark):
        g = nx.fast_gnp_random_graph(20, 0.15, seed=8)
        g.remove_nodes_from(list(nx.isolates(g)))
        srcs = sorted(g)[:5]
        n, k = g.number_of_nodes(), len(srcs)
        src_df = spark.createDataFrame([(str(s),) for s in srcs], "id string")
        got = {
            r.id: r.betweenness
            for r in betweenness_centrality(
                _edges_df(spark, g), sources=src_df
            ).collect()
        }
        raw = _py_brandes_subset(g, srcs)
        scale = 1.0 / ((n - 1) * (n - 2)) * n / k  # nx k-sample rescale
        for v, b in raw.items():
            assert abs(got[str(v)] - b * scale) < 1e-9, v

    def test_full_sample_equals_exact(self, spark):
        g = nx.fast_gnp_random_graph(15, 0.2, seed=13)
        g.remove_nodes_from(list(nx.isolates(g)))
        df = _edges_df(spark, g)
        src_df = df.select(
            "src").union(df.select("dst")).distinct().withColumnRenamed("src", "id")
        got = {
            r.id: r.betweenness
            for r in betweenness_centrality(df, sources=src_df).collect()
        }
        want = nx.betweenness_centrality(g)
        for kk, v in want.items():
            assert abs(got[str(kk)] - v) < 1e-9, kk


class TestEdgeBetweenness:
    @pytest.mark.parametrize("seed", [3, 11])
    @pytest.mark.parametrize("norm", [True, False])
    def test_undirected(self, spark, seed, norm):
        from grandiso_networkx_spark.operators.betweenness import (
            edge_betweenness,
        )

        g = nx.fast_gnp_random_graph(20, 0.15, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            (r.src, r.dst): r.betweenness
            for r in edge_betweenness(
                _edges_df(spark, g), normalized=norm
            ).collect()
        }
        want = nx.edge_betweenness_centrality(g, normalized=norm)
        assert len(got) == g.number_of_edges()
        for (u, v), b in want.items():
            a, c = sorted((str(u), str(v)))
            assert abs(got[(a, c)] - b) < 1e-9, (u, v)

    @pytest.mark.parametrize("norm", [True, False])
    def test_directed(self, spark, norm):
        from grandiso_networkx_spark.operators.betweenness import (
            edge_betweenness,
        )

        g = nx.fast_gnp_random_graph(18, 0.15, directed=True, seed=6)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            (r.src, r.dst): r.betweenness
            for r in edge_betweenness(
                _edges_df(spark, g), directed=True, normalized=norm
            ).collect()
        }
        want = nx.edge_betweenness_centrality(g, normalized=norm)
        for (u, v), b in want.items():
            assert abs(got[(str(u), str(v))] - b) < 1e-9, (u, v)

    def test_sampled_extrapolation(self, spark):
        """Full-source sample == exact (the n/k scale cancels)."""
        from grandiso_networkx_spark.operators.betweenness import (
            edge_betweenness,
        )

        g = nx.fast_gnp_random_graph(14, 0.2, seed=9)
        g.remove_nodes_from(list(nx.isolates(g)))
        df = _edges_df(spark, g)
        src_df = (
            df.select("src").union(df.select("dst")).distinct()
            .withColumnRenamed("src", "id")
        )
        got = {
            (r.src, r.dst): r.betweenness
            for r in edge_betweenness(df, sources=src_df).collect()
        }
        want = nx.edge_betweenness_centrality(g)
        for (u, v), b in want.items():
            a, c = sorted((str(u), str(v)))
            assert abs(got[(a, c)] - b) < 1e-9, (u, v)

    def test_bridge_dominates(self, spark):
        """Two triangles joined by one bridge: the bridge carries all
        cross-cluster pairs and must score highest."""
        from grandiso_networkx_spark.operators.betweenness import (
            edge_betweenness,
        )

        edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
        df = spark.createDataFrame(
            [(str(u), str(v)) for u, v in edges], "src string, dst string"
        )
        got = {
            (r.src, r.dst): r.betweenness
            for r in edge_betweenness(df).collect()
        }
        assert max(got, key=got.get) == ("2", "3")
