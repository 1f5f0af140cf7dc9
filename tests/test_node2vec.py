"""node2vec second-order biased walks vs a pure-python md5 oracle.

The oracle replays the exact deterministic scheme: uniform step 1,
then cumulative-weight inversion at u = h60(start|rep|step|seed)/2^60
with weights 1/p (return), 1 (neighbor of prev), 1/q (outward), folded
left-to-right over the sorted neighbor list — float-for-float the same
arithmetic as the Spark plan, so equality is exact.
"""

import hashlib

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.walks import node2vec_walks


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_node2vec(edges, p, q, walk_length, walks_per_vertex, seed=42,
                 max_degree=None, directed=True):
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
    ret_w, out_w = 1.0 / p, 1.0 / q
    rows = set()
    for start in adj:
        for rep in range(walks_per_vertex):
            nb = adj[start]
            prev = start
            cur = nb[_h60(f"{start}|{rep}|1|{seed}") % len(nb)]
            rows.add((start, rep, 0, start))
            rows.add((start, rep, 1, cur))
            for step in range(2, walk_length + 1):
                if cur not in adj:
                    break
                nb = adj[cur]
                pset = set(adj.get(prev, []))
                w = [
                    ret_w if x == prev else (1.0 if x in pset else out_w)
                    for x in nb
                ]
                tot = 0.0
                for wi in w:
                    tot += wi
                target = (_h60(f"{start}|{rep}|{step}|{seed}") / 2.0**60) * tot
                cum, sel = 0.0, None
                for i, wi in enumerate(w):
                    cum += wi
                    if sel is None and cum > target:
                        sel = i
                if sel is None:
                    sel = len(nb) - 1
                prev, cur = cur, nb[sel]
                rows.add((start, rep, step, cur))
    return rows


def _got(spark, edges, **kw):
    df = spark.createDataFrame(list(edges), "src string, dst string")
    return {
        (r["start"], r["rep"], r["step"], r["vertex"])
        for r in node2vec_walks(df, **kw).collect()
    }


EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d"),
         ("d", "a"), ("b", "a"), ("d", "b")]


def test_node2vec_matches_python_oracle(spark):
    got = _got(spark, EDGES, p=3.0, q=0.7, walk_length=5, walks_per_vertex=3)
    want = _py_node2vec(EDGES, 3.0, 0.7, 5, 3)
    assert got == want


def test_node2vec_undirected_and_capped(spark):
    got = _got(
        spark, EDGES, p=0.5, q=2.0, walk_length=4, walks_per_vertex=2,
        directed=False, max_degree=2,
    )
    want = _py_node2vec(EDGES, 0.5, 2.0, 4, 2, directed=False, max_degree=2)
    assert got == want


def test_node2vec_random_graph_edges_real(spark):
    g = nx.fast_gnp_random_graph(14, 0.3, seed=9, directed=True)
    edges = [(str(u), str(v)) for u, v in g.edges()]
    got = _got(spark, edges, p=2.0, q=0.5, walk_length=4, walks_per_vertex=2)
    want = _py_node2vec(edges, 2.0, 0.5, 4, 2)
    assert got == want
    e = {(u, v) for u, v in edges if u != v}
    by_walk = {}
    for s, r, st, v in got:
        by_walk.setdefault((s, r), {})[st] = v
    for path in by_walk.values():
        for st in range(1, max(path) + 1):
            if st in path and (st - 1) in path:
                assert (path[st - 1], path[st]) in e


def test_node2vec_partitioning_invariant(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {
        tuple(r)
        for r in node2vec_walks(df, p=4.0, q=0.25, walk_length=3).collect()
    }
    b = {
        tuple(r)
        for r in node2vec_walks(
            df.repartition(7, "dst"), p=4.0, q=0.25, walk_length=3
        ).collect()
    }
    assert a == b


def test_node2vec_bad_args(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        node2vec_walks(df, walk_length=0)
    with pytest.raises(ValueError):
        node2vec_walks(df, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(df, q=-1.0)
