"""Ego-net extraction vs nx.ego_graph; link-training pairs vs a
pure-python md5 oracle."""

import hashlib

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.sampling import (
    ego_net,
    link_training_pairs,
)

EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c"),
         ("e", "a"), ("c", "f"), ("g", "a")]


def _df(spark, edges=EDGES):
    return spark.createDataFrame(edges, "src string, dst string")


@pytest.mark.parametrize("radius", [0, 1, 2])
@pytest.mark.parametrize("directed", [False, True])
def test_ego_net_matches_networkx(spark, radius, directed):
    g = nx.DiGraph(EDGES) if directed else nx.Graph(EDGES)
    ego = nx.ego_graph(g, "a", radius=radius)
    if directed:
        want = set(ego.edges())
    else:
        # our output keeps stored orientation; nx.Graph canonicalizes
        stored = set(EDGES)
        want = {
            (u, v) if (u, v) in stored else (v, u) for u, v in ego.edges()
        }
    got = {
        (r["src"], r["dst"])
        for r in ego_net(_df(spark), "a", radius=radius, directed=directed).collect()
    }
    assert got == want


def test_ego_net_unreachable_radius_zero(spark):
    got = ego_net(_df(spark), "g", radius=0, directed=True).collect()
    assert got == []  # only {g}: no induced edges


def test_ego_net_bad_radius(spark):
    with pytest.raises(ValueError):
        ego_net(_df(spark), "a", radius=-1)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_pairs(edges, neg_per_pos, seed=42):
    e = {(u, v) for u, v in edges if u != v}
    verts = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(verts)
    out = {(u, v, 1) for u, v in e}
    negs = set()
    for u, v in e:
        for k in range(neg_per_pos):
            w = verts[_h60(f"{u}|{v}|{k}|{seed}") % n]
            if w != u and (u, w) not in e:
                negs.add((u, w, 0))
    return out | negs


@pytest.mark.parametrize("npp", [1, 3])
def test_link_training_pairs_match_oracle(spark, npp):
    got = {
        (r["src"], r["dst"], r["label"])
        for r in link_training_pairs(_df(spark), neg_per_pos=npp).collect()
    }
    assert got == _py_pairs(EDGES, npp)
    # no negative duplicates a positive, no self pairs
    pos = {(u, v) for u, v, l in got if l == 1}
    for u, v, l in got:
        assert u != v
        if l == 0:
            assert (u, v) not in pos


def test_link_training_pairs_bad_args(spark):
    with pytest.raises(ValueError):
        link_training_pairs(_df(spark), neg_per_pos=0)
