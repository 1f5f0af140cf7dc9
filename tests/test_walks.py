"""Deterministic random walks vs a pure-python md5 oracle."""

import hashlib

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.walks import random_walks


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_walks(edges, walk_length, walks_per_vertex, seed=42, max_degree=None,
              directed=True):
    pairs = set()
    for u, v in edges:
        if u != v:
            pairs.add((u, v))
            if not directed:
                pairs.add((v, u))
    adj = {}
    for u, v in sorted(pairs):
        adj.setdefault(u, []).append(v)
    if max_degree is not None:
        adj = {u: vs[:max_degree] for u, vs in adj.items()}
    rows = set()
    for start in adj:
        for rep in range(walks_per_vertex):
            cur = start
            rows.add((start, rep, 0, cur))
            for step in range(1, walk_length + 1):
                if cur not in adj:
                    break
                nb = adj[cur]
                cur = nb[_h60(f"{start}|{rep}|{step}|{seed}") % len(nb)]
                rows.add((start, rep, step, cur))
    return rows


def _got(spark, edges, **kw):
    df = spark.createDataFrame(list(edges), "src string, dst string")
    return {
        (r["start"], r["rep"], r["step"], r["vertex"])
        for r in random_walks(df, **kw).collect()
    }


EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d"),
         ("d", "d"), ("b", "a")]


def test_walks_match_python_oracle(spark):
    got = _got(spark, EDGES, walk_length=4, walks_per_vertex=3)
    want = _py_walks(EDGES, 4, 3)
    assert got == want


def test_walks_undirected_and_capped(spark):
    got = _got(
        spark, EDGES, walk_length=3, walks_per_vertex=2,
        directed=False, max_degree=2,
    )
    want = _py_walks(EDGES, 3, 2, directed=False, max_degree=2)
    assert got == want


def test_walks_end_at_sinks(spark):
    edges = [("x", "y")]  # y is a sink
    got = _got(spark, edges, walk_length=5, walks_per_vertex=1)
    # one walk from x: step0=x, step1=y, then it stops (y has no outs)
    assert got == {("x", 0, 0, "x"), ("x", 0, 1, "y")}


def test_walks_random_graph_structure(spark):
    g = nx.fast_gnp_random_graph(15, 0.3, seed=3, directed=True)
    edges = [(str(u), str(v)) for u, v in g.edges()]
    got = _got(spark, edges, walk_length=4, walks_per_vertex=2)
    want = _py_walks(edges, 4, 2)
    assert got == want
    # every consecutive pair in a walk is a real edge
    e = {(u, v) for u, v in edges if u != v}
    by_walk = {}
    for s, r, st, v in got:
        by_walk.setdefault((s, r), {})[st] = v
    for path in by_walk.values():
        for st in range(1, max(path) + 1):
            if st in path and (st - 1) in path:
                assert (path[st - 1], path[st]) in e


def test_walks_bad_args(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        random_walks(df, walk_length=0)
    with pytest.raises(ValueError):
        random_walks(df, walks_per_vertex=0)
