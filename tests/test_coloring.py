"""Jones-Plassmann greedy coloring: properness + <= Delta+1 colors on
every fixture, and EXACT output equality vs a pure python replay of
the same md5 priority arithmetic (the output is a deterministic
function of (edge set, seed))."""

import hashlib

import networkx as nx

from grandiso_networkx_spark.operators.coloring import greedy_coloring

SEED = 42


def _p(v: str, seed: int = SEED):
    return (
        int(hashlib.md5(f"{v}|color|{seed}".encode()).hexdigest()[:15], 16),
        v,
    )


def _jp_oracle(g: nx.Graph, seed: int = SEED) -> dict[str, int]:
    colors: dict[str, int] = {}
    live = set(g.nodes())
    while live:
        ready = [
            v
            for v in live
            if all(
                _p(v, seed) > _p(u, seed)
                for u in g.neighbors(v)
                if u in live and u != v
            )
        ]
        assert ready, "JP must make progress"
        for v in ready:
            used = {colors[u] for u in g.neighbors(v) if u in colors}
            c = 0
            while c in used:
                c += 1
            colors[v] = c
        live -= set(ready)
    return colors


def _edges_df(spark, g):
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


class TestColoring:
    def test_exact_vs_python_replay(self, spark):
        for gseed in (3, 11):
            g = nx.gnp_random_graph(35, 0.12, seed=gseed)
            g = nx.relabel_nodes(g, str)
            got = {
                r.id: r.color
                for r in greedy_coloring(_edges_df(spark, g)).collect()
            }
            want = _jp_oracle(
                g.subgraph([n for n in g.nodes() if g.degree(n) > 0])
            )
            assert got == want, gseed

    def test_proper_and_bounded(self, spark):
        g = nx.barbell_graph(6, 2)
        g = nx.relabel_nodes(g, str)
        got = {
            r.id: r.color
            for r in greedy_coloring(_edges_df(spark, g)).collect()
        }
        for u, v in g.edges():
            assert got[u] != got[v], (u, v)
        delta = max(d for _, d in g.degree())
        assert max(got.values()) <= delta

    def test_deterministic(self, spark):
        g = nx.gnp_random_graph(20, 0.2, seed=7)
        g = nx.relabel_nodes(g, str)
        df = _edges_df(spark, g)
        a = sorted((r.id, r.color) for r in greedy_coloring(df).collect())
        b = sorted((r.id, r.color) for r in greedy_coloring(df).collect())
        assert a == b

    def test_self_loop_only_vertex(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("z", "z")], "src string, dst string"
        )
        got = {r.id: r.color for r in greedy_coloring(edges).collect()}
        assert got["z"] == 0 and got["a"] != got["b"]
