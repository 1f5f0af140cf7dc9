"""Handshake maximal matching vs a pure-Python replay of the same
rule; weighted variant's 1/2-approximation vs nx.max_weight_matching."""

import hashlib

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.matching import maximal_matching


def _edges_df(spark, g, weights=None):
    if weights is None:
        rows = [(str(u), str(v)) for u, v in g.edges()]
        return spark.createDataFrame(rows, "src string, dst string")
    rows = [(str(u), str(v), float(w)) for (u, v), w in weights.items()]
    return spark.createDataFrame(rows, "src string, dst string, w double")


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_matching(edge_prio):
    """edge_prio: {(u,v): priority tuple}; the handshake loop."""
    live = dict(edge_prio)
    matched = set()
    while live:
        best = {}
        for (u, v), p in live.items():
            key = (p, u, v)
            for x in (u, v):
                if x not in best or key < best[x]:
                    best[x] = key
        hs = {
            (u, v)
            for (u, v), p in live.items()
            if best[u] == (p, u, v) and best[v] == (p, u, v)
        }
        assert hs, "progress guaranteed by the global minimum"
        matched |= hs
        used = {x for e in hs for x in e}
        live = {e: p for e, p in live.items() if not (set(e) & used)}
    return matched


@pytest.mark.parametrize("seed", [1, 8, 21])
def test_unweighted_matches_replay(spark, seed):
    g = nx.fast_gnp_random_graph(26, 0.15, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    got = {
        (r.src, r.dst) for r in maximal_matching(_edges_df(spark, g)).collect()
    }
    prio = {
        (u, v): _hash60(f"{u}|{v}|42")
        for u, v in (tuple(sorted((str(a), str(b)))) for a, b in g.edges())
    }
    assert got == _ref_matching(prio)


@pytest.mark.parametrize("seed", [5, 13])
def test_matching_properties(spark, seed):
    g = nx.fast_gnp_random_graph(30, 0.12, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    m = {(r.src, r.dst) for r in maximal_matching(_edges_df(spark, g)).collect()}
    used = [x for e in m for x in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    # maximal: every edge has a matched endpoint
    for u, v in g.edges():
        a, b = sorted((str(u), str(v)))
        assert a in set(used) or b in set(used) or (a, b) in m


def test_weighted_half_approximation(spark):
    rng = nx.utils.create_random_state(3)
    g = nx.fast_gnp_random_graph(16, 0.3, seed=7)
    g.remove_nodes_from(list(nx.isolates(g)))
    weights = {
        tuple(sorted((str(u), str(v)))): 1 + int(10 * rng.random_sample())
        for u, v in g.edges()
    }
    rows = maximal_matching(
        _edges_df(spark, g, weights), weight_col="w"
    ).collect()
    got_w = sum(r.w for r in rows)
    used = [x for r in rows for x in (r.src, r.dst)]
    assert len(used) == len(set(used))
    gw = nx.Graph()
    for (u, v), w in weights.items():
        gw.add_edge(u, v, weight=w)
    opt = nx.max_weight_matching(gw)
    opt_w = sum(gw[u][v]["weight"] for u, v in opt)
    assert got_w >= 0.5 * opt_w


def test_weighted_priority_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)],
        "src string, dst string, w double",
    )
    a = sorted((r.src, r.dst) for r in maximal_matching(df, weight_col="w").collect())
    b = sorted((r.src, r.dst) for r in maximal_matching(df, weight_col="w").collect())
    assert a == b
    # equal weights: smallest (src, dst) wins locally -> (a,b) and (c,d)
    assert a == [("a", "b"), ("c", "d")]


class TestVertexCover:
    @pytest.mark.parametrize("seed", [2, 14])
    def test_cover_property_and_bound(self, spark, seed):
        from itertools import combinations

        from grandiso_networkx_spark.operators.matching import (
            vertex_cover_2approx,
        )

        g = nx.fast_gnp_random_graph(12, 0.25, seed=seed)
        g.remove_nodes_from(list(nx.isolates(g)))
        cover = {
            r.id for r in vertex_cover_2approx(_edges_df(spark, g)).collect()
        }
        # every edge covered
        for u, v in g.edges():
            assert str(u) in cover or str(v) in cover
        # brute-force optimum on the small graph
        verts = sorted(str(v) for v in g)
        opt = None
        for k in range(len(verts) + 1):
            for sub in combinations(verts, k):
                s = set(sub)
                if all(str(u) in s or str(v) in s for u, v in g.edges()):
                    opt = k
                    break
            if opt is not None:
                break
        assert len(cover) <= 2 * opt
