"""Butterfly counting: brute-force differential on random bipartite
graphs, left/right pairing-side equality, per-vertex counts, and the
wedge-degree guard."""

import itertools

import networkx as nx
import pytest


def _brute(edge_list):
    """(global count, per-left counts, per-right counts) by enumerating
    same-side pairs."""
    adj_l, adj_r = {}, {}
    for u, v in set(edge_list):
        adj_l.setdefault(u, set()).add(v)
        adj_r.setdefault(v, set()).add(u)

    def side_counts(adj):
        per = {x: 0 for x in adj}
        total = 0
        for a, b in itertools.combinations(sorted(adj), 2):
            w = len(adj[a] & adj[b])
            c = w * (w - 1) // 2
            total += c
            per[a] += c
            per[b] += c
        return total, per

    tl, pl = side_counts(adj_l)
    tr, pr = side_counts(adj_r)
    assert tl == tr  # identity: both sides count every butterfly once
    return tl, pl, pr


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"l{u}", f"r{v}") for u, v in edge_list], "src string, dst string"
    )


def _random_bipartite(nl, nr, p, seed):
    g = nx.bipartite.random_graph(nl, nr, p, seed=seed)
    return [(u, v - nl) for u, v in g.edges()]


class TestButterflyCount:
    def test_matches_brute_force(self, spark):
        from grandiso_networkx_spark.operators.butterflies import (
            butterfly_count,
        )

        for seed in (1, 4):
            el = _random_bipartite(12, 9, 0.35, seed)
            want, _, _ = _brute(el)
            (row,) = butterfly_count(_edges_df(spark, el)).collect()
            assert row.butterflies == want

    def test_wedge_side_choice(self, spark):
        """3 right hubs vs 40 left leaves: Σdeg² is far cheaper through
        the left side, so pairing must run through it."""
        from grandiso_networkx_spark.operators.butterflies import (
            butterfly_count,
        )

        el = [(u, v) for u in range(40) for v in range(3)]
        (row,) = butterfly_count(_edges_df(spark, el)).collect()
        # complete bipartite K(40,3): C(40,2)*C(3,2) butterflies
        assert row.butterflies == 780 * 3
        assert row.wedge_side == "left"

    def test_parallel_edges_collapse(self, spark):
        from grandiso_networkx_spark.operators.butterflies import (
            butterfly_count,
        )

        el = [(0, 0), (0, 1), (1, 0), (1, 1)]
        (row,) = butterfly_count(_edges_df(spark, el + el)).collect()
        assert row.butterflies == 1

    def test_empty_and_butterfly_free(self, spark):
        from grandiso_networkx_spark.operators.butterflies import (
            butterfly_count,
        )

        (row,) = butterfly_count(
            _edges_df(spark, [(0, 0), (1, 1), (2, 2)])
        ).collect()
        assert row.butterflies == 0


class TestButterflyPerVertex:
    def test_matches_brute_force_both_sides(self, spark):
        from grandiso_networkx_spark.operators.butterflies import (
            butterfly_per_vertex,
        )

        el = _random_bipartite(10, 8, 0.4, seed=7)
        _, want_l, want_r = _brute(el)
        df = _edges_df(spark, el)
        got_l = {
            r.id: r.butterflies
            for r in butterfly_per_vertex(df, side="left").collect()
        }
        got_r = {
            r.id: r.butterflies
            for r in butterfly_per_vertex(df, side="right").collect()
        }
        assert got_l == {f"l{u}": c for u, c in want_l.items()}
        assert got_r == {f"r{v}": c for v, c in want_r.items()}

    def test_bad_side_raises(self, spark):
        from grandiso_networkx_spark.operators.butterflies import (
            butterfly_per_vertex,
        )

        with pytest.raises(ValueError):
            butterfly_per_vertex(_edges_df(spark, [(0, 0)]), side="up")


class TestWedgeGuard:
    def test_cap_drops_only_over_cap_wedges(self, spark):
        from grandiso_networkx_spark.operators.butterflies import (
            butterfly_count,
        )

        # Σdeg² picks the right side as wedge side (56 vs 76); right
        # vertex 5 is its degree-6 hub, right 0..4 have degree 2
        el = [(u, v) for u in (0, 1) for v in range(5)] + [
            (u, 5) for u in range(6)
        ]
        df = _edges_df(spark, el)
        (full,) = butterfly_count(df).collect()
        want, _, _ = _brute(el)
        assert full.butterflies == want and full.wedge_side == "right"
        # cap below the hub's degree: wedges through it vanish, which
        # equals counting on the support without the hub's edges
        (capped,) = butterfly_count(df, max_wedge_degree=5).collect()
        want_cap, _, _ = _brute([(u, v) for u, v in el if v != 5])
        assert capped.butterflies == want_cap
        # cap at/above the max degree is exact
        (same,) = butterfly_count(df, max_wedge_degree=6).collect()
        assert same.butterflies == want
