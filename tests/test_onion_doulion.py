"""Onion decomposition vs networkx; DOULION sampled triangles vs a
pure-python replay of the same portable-hash sparsification."""

import hashlib

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.kcore import onion_layers
from grandiso_networkx_spark.operators.triangles import (
    triangle_count,
    triangle_count_sampled,
)


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


class TestOnion:
    @pytest.mark.parametrize("seed", [1, 7, 23])
    def test_matches_networkx(self, spark, seed):
        g = nx.fast_gnp_random_graph(30, 0.12, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        got = {
            r.id: (r.core, r.layer)
            for r in onion_layers(_edges_df(spark, g)).collect()
        }
        want_layer = nx.onion_layers(g)
        want_core = nx.core_number(g)
        assert set(got) == {str(v) for v in g}
        for v in g:
            assert got[str(v)] == (want_core[v], want_layer[v]), v

    def test_star_plus_clique(self, spark):
        # leaves peel in layer 1 (core 0 after center removal? no —
        # leaves have deg 1 => layer 1 core 1), then center, then clique
        g = nx.star_graph(4)
        g.add_edges_from(
            (u + 10, v + 10) for u, v in nx.complete_graph(4).edges()
        )
        got = {
            r.id: (r.core, r.layer)
            for r in onion_layers(_edges_df(spark, g)).collect()
        }
        want_layer = nx.onion_layers(g)
        want_core = nx.core_number(g)
        for v in g:
            assert got[str(v)] == (want_core[v], want_layer[v]), v

    def test_self_loop_only_vertex_is_layer_one(self, spark):
        df = spark.createDataFrame(
            [("a", "a"), ("b", "c"), ("c", "d"), ("d", "b")],
            "src string, dst string",
        )
        got = {r.id: (r.core, r.layer) for r in onion_layers(df).collect()}
        assert got["a"] == (0, 1)
        # the triangle peels as one layer after the isolated shift
        assert got["b"] == got["c"] == got["d"] == (2, 2)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestDoulion:
    def test_full_keep_equals_exact(self, spark):
        g = nx.fast_gnp_random_graph(40, 0.2, seed=5)
        df = _edges_df(spark, g)
        row = triangle_count_sampled(df, keep=1000, mod=1000).collect()[0]
        exact = triangle_count(df)
        assert row.n_sampled == exact
        assert row.estimate == float(exact)

    def test_matches_python_replay(self, spark):
        g = nx.fast_gnp_random_graph(40, 0.25, seed=9)
        df = _edges_df(spark, g)
        keep, mod, seed = 700, 1000, 42
        kept = [
            (u, v)
            for u, v in (
                tuple(sorted((str(a), str(b)))) for a, b in g.edges()
            )
            if _hash60(f"{u}|{v}|{seed}") % mod < keep
        ]
        h = nx.Graph()
        h.add_edges_from(kept)
        want = sum(nx.triangles(h).values()) // 3
        row = triangle_count_sampled(df, keep=keep, mod=mod, seed=seed).collect()[0]
        assert row.n_sampled == want
        assert row.estimate == round(want / 0.7**3, 6)

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            triangle_count_sampled(df, keep=0)
        with pytest.raises(ValueError):
            triangle_count_sampled(df, keep=2000, mod=1000)


class TestFourProfile:
    @staticmethod
    def _brute(g):
        from itertools import combinations

        pats = {
            "p4": nx.path_graph(4),
            "claw": nx.star_graph(3),
            "c4": nx.cycle_graph(4),
            "paw": nx.Graph([(0, 1), (1, 2), (2, 0), (0, 3)]),
            "diamond": nx.Graph([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]),
            "k4": nx.complete_graph(4),
        }
        out = dict.fromkeys(pats, 0)
        for quad in combinations(g.nodes(), 4):
            sub = g.subgraph(quad)
            if not nx.is_connected(sub):
                continue
            for name, p in pats.items():
                if nx.is_isomorphic(sub, p):
                    out[name] += 1
                    break
        return out

    @pytest.mark.parametrize("seed", [4, 15, 33])
    def test_matches_brute_force(self, spark, seed):
        from grandiso_networkx_spark.operators.triangles import four_profile

        g = nx.fast_gnp_random_graph(14, 0.3, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        df = spark.createDataFrame(
            [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
        )
        row = four_profile(df).collect()[0]
        want = self._brute(g)
        got = {k: row[k] for k in want}
        assert got == want

    def test_known_shapes(self, spark):
        from grandiso_networkx_spark.operators.triangles import four_profile

        for g, key, n in [
            (nx.complete_graph(4), "k4", 1),
            (nx.cycle_graph(4), "c4", 1),
            (nx.path_graph(4), "p4", 1),
            (nx.star_graph(3), "claw", 1),
        ]:
            df = spark.createDataFrame(
                [(str(u), str(v)) for u, v in g.edges()],
                "src string, dst string",
            )
            row = four_profile(df).collect()[0]
            prof = {k: row[k] for k in ("p4", "claw", "c4", "paw", "diamond", "k4")}
            assert prof.pop(key) == n, (key, prof)
            assert all(v == 0 for v in prof.values()), (key, prof)
