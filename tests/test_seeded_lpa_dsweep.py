"""Seeded label propagation vs a pure-Python synchronous replay;
double-sweep diameter bound vs networkx eccentricities."""

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.bfs import double_sweep
from grandiso_networkx_spark.operators.label_propagation import (
    seeded_label_propagation,
)


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


def _ref_seeded_lpa(g, seeds, max_iter):
    labels = {str(v): seeds.get(str(v)) for v in g}
    clamp = set(seeds)
    for _ in range(max_iter):
        new = {}
        changed = False
        for v in g:
            sv = str(v)
            if sv in clamp:
                new[sv] = labels[sv]
                continue
            freq = {}
            for u in g[v]:
                lu = labels[str(u)]
                if lu is not None:
                    freq[lu] = freq.get(lu, 0) + 1
            if freq:
                best = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            else:
                best = labels[sv]
            new[sv] = best
            changed = changed or best != labels[sv]
        labels = new
        if not changed:
            break
    return labels


class TestSeededLPA:
    @pytest.mark.parametrize("seed", [4, 17])
    def test_matches_python_replay(self, spark, seed):
        g = nx.fast_gnp_random_graph(24, 0.12, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        vs = sorted(str(v) for v in g)
        seeds = {vs[0]: "A", vs[-1]: "B", vs[len(vs) // 2]: "C"}
        sdf = spark.createDataFrame(
            list(seeds.items()), "id string, label string"
        )
        got = {
            r.id: r.label
            for r in seeded_label_propagation(
                _edges_df(spark, g), sdf, max_iter=8
            ).collect()
        }
        want = _ref_seeded_lpa(g, seeds, 8)
        assert got == want

    def test_two_cliques_split(self, spark):
        g = nx.Graph()
        g.add_edges_from(nx.complete_graph(range(0, 4)).edges())
        g.add_edges_from(nx.complete_graph(range(10, 14)).edges())
        g.add_edge(3, 10)
        sdf = spark.createDataFrame(
            [("0", "L"), ("13", "R")], "id string, label string"
        )
        got = {
            r.id: r.label
            for r in seeded_label_propagation(
                _edges_df(spark, g), sdf, max_iter=10
            ).collect()
        }
        assert {got[str(v)] for v in range(0, 3)} == {"L"}
        assert {got[str(v)] for v in range(11, 14)} == {"R"}

    def test_unreached_stay_null_and_clamp_holds(self, spark):
        df = spark.createDataFrame(
            [("a", "b"), ("c", "d")], "src string, dst string"
        )
        sdf = spark.createDataFrame([("a", "X")], "id string, label string")
        got = {
            r.id: r.label
            for r in seeded_label_propagation(df, sdf, max_iter=5).collect()
        }
        assert got["a"] == "X" and got["b"] == "X"
        assert got["c"] is None and got["d"] is None

    def test_duplicate_seed_rows_take_min_label(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        sdf = spark.createDataFrame(
            [("a", "Z"), ("a", "A")], "id string, label string"
        )
        got = {
            r.id: r.label
            for r in seeded_label_propagation(df, sdf, max_iter=3).collect()
        }
        assert got == {"a": "A", "b": "A"}


class TestDoubleSweep:
    @pytest.mark.parametrize("seed", [3, 12, 31])
    def test_bound_is_valid_and_matches_replay(self, spark, seed):
        g = nx.fast_gnp_random_graph(25, 0.1, seed=seed)
        g = g.subgraph(max(nx.connected_components(g), key=len)).copy()
        row = double_sweep(_edges_df(spark, g)).collect()[0]
        # exact replay of the pinned rule
        start = min(str(v) for v in g)
        d1 = nx.single_source_shortest_path_length(g, _orig(g, start))
        far = sorted(((v, d) for v, d in d1.items()), key=lambda t: (-t[1], str(t[0])))[0][0]
        d2 = nx.single_source_shortest_path_length(g, far)
        lb = max(d2.values())
        assert row.start_id == start
        assert row.far_id == str(far)
        assert row.diameter_lb == lb
        # it is a genuine lower bound, and ecc(far) is an upper sample
        assert lb <= nx.diameter(g)

    def test_path_graph_exact(self, spark):
        g = nx.path_graph(7)
        row = double_sweep(_edges_df(spark, g)).collect()[0]
        assert row.diameter_lb == 6


def _orig(g, sid):
    return next(v for v in g if str(v) == sid)


class TestLandmarks:
    def test_matches_networkx_bfs(self, spark):
        from grandiso_networkx_spark.operators.bfs import landmark_distances

        g = nx.fast_gnp_random_graph(24, 0.12, seed=6)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            (r.landmark, r.id): r.dist
            for r in landmark_distances(_edges_df(spark, g), 3).collect()
        }
        lms = sorted(str(v) for v in g)[:3]
        want = {}
        for lm in lms:
            src = next(v for v in g if str(v) == lm)
            for v, d in nx.single_source_shortest_path_length(g, src).items():
                want[(lm, str(v))] = d
        assert got == want

    def test_triangle_inequality_bound(self, spark):
        from grandiso_networkx_spark.operators.bfs import landmark_distances

        g = nx.fast_gnp_random_graph(18, 0.2, seed=8)
        g = g.subgraph(max(nx.connected_components(g), key=len)).copy()
        rows = landmark_distances(_edges_df(spark, g), 2).collect()
        d = {(r.landmark, r.id): r.dist for r in rows}
        lms = {r.landmark for r in rows}
        for u in g:
            for v in g:
                est = min(
                    d[(l, str(u))] + d[(l, str(v))]
                    for l in lms
                    if (l, str(u)) in d and (l, str(v)) in d
                )
                assert est >= nx.shortest_path_length(g, u, v)

    def test_validation(self, spark):
        from grandiso_networkx_spark.operators.bfs import landmark_distances

        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            landmark_distances(df, 0)
