"""L-Spar similarity sparsification vs a pure-Python replay."""

import math

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.sparsify import sparsify_similarity


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


def _ref_sparsify(g, e):
    adj = {str(v): {str(u) for u in g[v]} for v in g}
    kept = set()
    out = {}
    for v, nv in adj.items():
        scored = []
        for u in nv:
            cn = len(nv & adj[u])
            j = cn / (len(nv) + len(adj[u]) - cn)
            scored.append((u, j))
        scored.sort(key=lambda t: (-t[1], t[0]))
        k = math.ceil(len(nv) ** e)
        for u, j in scored[:k]:
            key = tuple(sorted((v, u)))
            kept.add(key)
            out[key] = j
    return {k: out[k] for k in kept}


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        sparsify_similarity(df, e=0.0)
    with pytest.raises(ValueError):
        sparsify_similarity(df, e=1.5)


@pytest.mark.parametrize("seed", [2, 9, 27])
def test_replay(spark, seed):
    g = nx.fast_gnp_random_graph(28, 0.18, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    got = {
        (r.src, r.dst): r.jaccard
        for r in sparsify_similarity(_edges_df(spark, g)).collect()
    }
    want = _ref_sparsify(g, 0.5)
    assert set(got) == set(want)
    for k, j in want.items():
        assert got[k] == pytest.approx(j, abs=1e-12)


def test_keeps_community_edges_over_bridges(spark):
    # two K5s joined by one bridge: the bridge has Jaccard 0 and is
    # dropped once both endpoints have better neighbors
    g = nx.Graph()
    g.add_edges_from(nx.complete_graph(range(0, 5)).edges())
    g.add_edges_from(nx.complete_graph(range(10, 15)).edges())
    g.add_edge(4, 10)
    kept = {
        (r.src, r.dst)
        for r in sparsify_similarity(_edges_df(spark, g)).collect()
    }
    assert ("10", "4") not in kept and ("4", "10") not in kept
    # intra-clique edges survive
    assert any(a[0] in "0123" and b[0] in "0123" for a, b in kept)


def test_every_vertex_retains_an_edge(spark):
    g = nx.fast_gnp_random_graph(20, 0.2, seed=5)
    g.remove_nodes_from(list(nx.isolates(g)))
    kept = sparsify_similarity(_edges_df(spark, g)).collect()
    covered = {r.src for r in kept} | {r.dst for r in kept}
    assert covered == {str(v) for v in g}  # keep >= 1 per vertex
