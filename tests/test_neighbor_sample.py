"""Layered neighbor sampling vs a pure-Python replay of the same
portable-hash ranking."""

import hashlib

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.sampling import neighbor_sample


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_sample(g, seeds, fanouts, seed):
    adj = {str(v): sorted(str(u) for u in g[v]) for v in g}
    frontier = set(seeds)
    rows = []
    for h, fan in enumerate(fanouts, start=1):
        nxt = set()
        for v in sorted(frontier):
            nbrs = sorted(
                adj.get(v, []),
                key=lambda u: (_hash60(f"{v}|{u}|{h}|{seed}"), u),
            )[:fan]
            for u in nbrs:
                rows.append((h, v, u))
                nxt.add(u)
        frontier = nxt
    return sorted(rows)


@pytest.mark.parametrize("fanouts", [[2], [3, 2], [2, 2, 1]])
def test_matches_replay(spark, fanouts):
    g = nx.fast_gnp_random_graph(22, 0.2, seed=11)
    g.remove_nodes_from(list(nx.isolates(g)))
    seeds = sorted(str(v) for v in g)[:3]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id string")
    got = sorted(
        tuple(r)
        for r in neighbor_sample(_edges_df(spark, g), sdf, fanouts, seed=7).collect()
    )
    assert got == _ref_sample(g, seeds, fanouts, 7)


def test_fanout_bound_and_determinism(spark):
    g = nx.star_graph(50)  # hub with 50 leaves
    sdf = spark.createDataFrame([("0",)], "id string")
    a = neighbor_sample(_edges_df(spark, g), sdf, [5, 3]).collect()
    b = neighbor_sample(_edges_df(spark, g), sdf, [5, 3]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    hop1 = [r for r in a if r.hop == 1]
    assert len(hop1) == 5  # hub emits exactly fanout edges
    # hop 2: each sampled leaf has only the hub as neighbor
    hop2 = [r for r in a if r.hop == 2]
    assert all(r.dst == "0" for r in hop2) and len(hop2) == 5


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    sdf = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError):
        neighbor_sample(df, sdf, [])
    with pytest.raises(ValueError):
        neighbor_sample(df, sdf, [2, 0])
