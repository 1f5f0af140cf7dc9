"""SALSA hubs/authorities: closed form vs numpy replica, iterate →
closed-form convergence, and structural properties (mass split across
support components, degree proportionality)."""

import collections

import networkx as nx
import pytest


def _numpy_salsa(edge_list):
    """Single-node replica of the Lempel–Moran closed form."""
    indeg = collections.Counter(v for _, v in set(edge_list))
    outdeg = collections.Counter(u for u, _ in set(edge_list))
    b = nx.Graph()
    for u, v in set(edge_list):
        b.add_edge("h:" + u, "a:" + v)
    want_a, want_h = {}, {}
    for comp in nx.connected_components(b):
        ca = [x[2:] for x in comp if x.startswith("a:")]
        ch = [x[2:] for x in comp if x.startswith("h:")]
        wa = sum(indeg[j] for j in ca)
        wh = sum(outdeg[i] for i in ch)
        for j in ca:
            want_a[j] = (len(ca) / len(indeg)) * indeg[j] / wa
        for i in ch:
            want_h[i] = (len(ch) / len(outdeg)) * outdeg[i] / wh
    return want_h, want_a


def _spark_scores(spark, edge_list, fn, **kw):
    edges = spark.createDataFrame(
        [(str(u), str(v)) for u, v in edge_list], "src string, dst string"
    )
    return {r.id: (r.hub, r.authority) for r in fn(edges, **kw).collect()}


class TestSalsaClosedForm:
    def test_matches_numpy_replica(self, spark):
        from grandiso_networkx_spark.operators.salsa import salsa

        for seed in (3, 9):
            g = nx.gnp_random_graph(50, 0.06, seed=seed, directed=True)
            el = [(str(u), str(v)) for u, v in g.edges()]
            got = _spark_scores(spark, el, salsa)
            want_h, want_a = _numpy_salsa(el)
            for vid, (h, a) in got.items():
                assert h == pytest.approx(want_h.get(vid, 0.0), abs=1e-12)
                assert a == pytest.approx(want_a.get(vid, 0.0), abs=1e-12)

    def test_sums_to_one_per_side(self, spark):
        from grandiso_networkx_spark.operators.salsa import salsa

        g = nx.gnp_random_graph(40, 0.08, seed=5, directed=True)
        got = _spark_scores(spark, list(g.edges()), salsa)
        assert sum(h for h, _ in got.values()) == pytest.approx(1.0)
        assert sum(a for _, a in got.values()) == pytest.approx(1.0)

    def test_component_mass_split(self, spark):
        """Two disjoint stars: component authority mass ∝ authority
        count, hub mass ∝ hub count — the walk never mixes them."""
        from grandiso_networkx_spark.operators.salsa import salsa

        # star 1: hub 0 -> authorities 1..3; star 2: hub 10 -> 11..12
        el = [(0, 1), (0, 2), (0, 3), (10, 11), (10, 12)]
        got = _spark_scores(spark, el, salsa)
        # 5 authorities total: comp1 has 3 (mass 3/5 split evenly),
        # comp2 has 2 (mass 2/5 split evenly)
        for j in ("1", "2", "3"):
            assert got[j][1] == pytest.approx(1 / 5)
        for j in ("11", "12"):
            assert got[j][1] == pytest.approx(1 / 5)
        # 2 hubs: each component holds one, mass 1/2 each
        assert got["0"][0] == pytest.approx(1 / 2)
        assert got["10"][0] == pytest.approx(1 / 2)
        # pure hubs have authority 0 and vice versa
        assert got["0"][1] == 0.0 and got["1"][0] == 0.0

    def test_parallel_edges_collapse_to_support(self, spark):
        from grandiso_networkx_spark.operators.salsa import salsa

        el = [(0, 1), (0, 1), (0, 2), (1, 2)]
        got = _spark_scores(spark, el, salsa)
        want = _spark_scores(spark, [(0, 1), (0, 2), (1, 2)], salsa)
        assert got == want


class TestSalsaIterate:
    def test_converges_to_closed_form(self, spark):
        from grandiso_networkx_spark.operators.salsa import (
            salsa,
            salsa_iterate,
        )

        g = nx.gnp_random_graph(40, 0.08, seed=7, directed=True)
        el = list(g.edges())
        want = _spark_scores(spark, el, salsa)
        got = _spark_scores(spark, el, salsa_iterate, rounds=40)
        # geometric convergence at the chain's second eigenvalue:
        # ~2e-7 residual after 40 rounds on this graph
        for vid in want:
            assert got[vid][0] == pytest.approx(want[vid][0], abs=5e-6)
            assert got[vid][1] == pytest.approx(want[vid][1], abs=5e-6)

    def test_mass_conserved_every_round(self, spark):
        from grandiso_networkx_spark.operators.salsa import salsa_iterate

        g = nx.gnp_random_graph(30, 0.1, seed=2, directed=True)
        for rounds in (1, 3):
            got = _spark_scores(
                spark, list(g.edges()), salsa_iterate, rounds=rounds
            )
            assert sum(h for h, _ in got.values()) == pytest.approx(1.0)
            assert sum(a for _, a in got.values()) == pytest.approx(1.0)

    def test_empty_graph(self, spark):
        from grandiso_networkx_spark.operators.salsa import (
            salsa,
            salsa_iterate,
        )

        edges = spark.createDataFrame([], "src string, dst string")
        assert salsa(edges).count() == 0
        assert salsa_iterate(edges).count() == 0
