"""Weisfeiler-Lehman refinement: colors bit-for-bit vs a python replay
of the md5/modular-sum arithmetic; isomorphism invariance; the classic
1-WL indistinguishable pair as a documented limitation."""

import hashlib
import random

import networkx as nx

from grandiso_networkx_spark.operators.wl import wl_colors, wl_graph_hash

MOD = 1 << 61


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _oracle_colors(g: nx.Graph, rounds: int) -> dict[str, int]:
    colors = {
        v: _h(f"init|{g.degree(v)}") for v in g.nodes() if g.degree(v) > 0
    }
    for _ in range(rounds):
        nxt = {}
        for v in colors:
            m = sum(_h(f"nbr|{colors[u]}") for u in g.neighbors(v)) % MOD
            nxt[v] = _h(f"{colors[v]}|{m}")
        colors = nxt
    return colors


def _df(spark, g):
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


class TestWL:
    def test_colors_bit_for_bit(self, spark):
        g = nx.gnp_random_graph(30, 0.12, seed=21)
        g = nx.relabel_nodes(g, str)
        got = {
            r.id: r.color for r in wl_colors(_df(spark, g), rounds=3).collect()
        }
        assert got == _oracle_colors(g, 3)

    def test_isomorphic_relabeling_same_hash(self, spark):
        g = nx.gnp_random_graph(25, 0.15, seed=2)
        perm = list(g.nodes())
        random.Random(5).shuffle(perm)
        h = nx.relabel_nodes(g, {n: f"x{p}" for n, p in zip(g.nodes(), perm)})
        g = nx.relabel_nodes(g, str)
        (a,) = wl_graph_hash(_df(spark, g)).collect()
        (b,) = wl_graph_hash(_df(spark, h)).collect()
        assert a.wl_hash == b.wl_hash

    def test_distinguishable_graphs_differ(self, spark):
        p = nx.path_graph(6)
        s = nx.star_graph(5)
        (a,) = wl_graph_hash(_df(spark, nx.relabel_nodes(p, str))).collect()
        (b,) = wl_graph_hash(_df(spark, nx.relabel_nodes(s, str))).collect()
        assert a.wl_hash != b.wl_hash

    def test_known_1wl_limit_two_triangles_vs_hexagon(self, spark):
        # the textbook counterexample: 2xC3 and C6 are both 2-regular,
        # 1-WL CANNOT separate them — equal hashes document the limit
        # (the engine's exact motif matcher is the confirm step)
        two_tri = nx.disjoint_union(nx.cycle_graph(3), nx.cycle_graph(3))
        hexagon = nx.cycle_graph(6)
        (a,) = wl_graph_hash(
            _df(spark, nx.relabel_nodes(two_tri, str))
        ).collect()
        (b,) = wl_graph_hash(
            _df(spark, nx.relabel_nodes(hexagon, str))
        ).collect()
        assert a.wl_hash == b.wl_hash

    def test_orbit_structure_star(self, spark):
        g = nx.relabel_nodes(nx.star_graph(6), str)
        got = {
            r.id: r.color for r in wl_colors(_df(spark, g), rounds=2).collect()
        }
        leaves = {got[str(i)] for i in range(1, 7)}
        assert len(leaves) == 1
        assert got["0"] not in leaves
