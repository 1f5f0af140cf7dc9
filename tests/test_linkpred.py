"""Link-prediction scores vs networkx oracles (jaccard_coefficient,
adamic_adar_index, common_neighbors, resource_allocation_index,
preferential_attachment)."""

import math

import networkx as nx
import pytest

from grandiso_networkx_spark.operators.linkpred import link_prediction_scores


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string").distinct()


def _got(spark, g, **kw):
    return {
        (r.u, r.v): (
            r.common,
            r.jaccard,
            r.adamic_adar,
            r.resource_allocation,
            r.pref_attachment,
        )
        for r in link_prediction_scores(_edges_df(spark, g), **kw).collect()
    }


def _check_against_nx(g, got):
    assert got, "no pairs scored"
    for (u, v), (common, jac, aa, ra, pa) in got.items():
        nu, nv = int(u), int(v)
        cn = len(list(nx.common_neighbors(g, nu, nv)))
        assert common == cn and cn >= 1
        _, _, want_jac = next(iter(nx.jaccard_coefficient(g, [(nu, nv)])))
        _, _, want_aa = next(iter(nx.adamic_adar_index(g, [(nu, nv)])))
        _, _, want_ra = next(
            iter(nx.resource_allocation_index(g, [(nu, nv)]))
        )
        _, _, want_pa = next(iter(nx.preferential_attachment(g, [(nu, nv)])))
        assert math.isclose(jac, want_jac, rel_tol=1e-9)
        assert math.isclose(aa, want_aa, rel_tol=1e-9)
        assert math.isclose(ra, want_ra, rel_tol=1e-9)
        assert pa == want_pa


def _pair_universe(g):
    """Every unordered pair (by string order) with >= 1 common neighbor."""
    out = set()
    nodes = list(g.nodes())
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if len(list(nx.common_neighbors(g, a, b))):
                out.add(tuple(sorted((str(a), str(b)))))
    return out


class TestLinkPrediction:
    def test_karate_exact(self, spark):
        g = nx.karate_club_graph()
        got = _got(spark, g)
        assert set(got) == _pair_universe(g)
        _check_against_nx(g, got)

    def test_min_common(self, spark):
        g = nx.karate_club_graph()
        got = _got(spark, g, min_common=3)
        assert got and all(t[0] >= 3 for t in got.values())
        _check_against_nx(g, got)

    def test_random(self, spark):
        g = nx.fast_gnp_random_graph(25, 0.2, seed=11)
        got = _got(spark, g)
        assert set(got) == _pair_universe(g)
        _check_against_nx(g, got)

    def test_hub_guard_drops_hub_wedges(self, spark):
        # Star center has degree 10; guarding at 5 removes every pair
        # that only met through the hub, keeping pairs joined by the
        # low-degree rim path.
        g = nx.star_graph(10)
        g.add_edge(1, 2)  # rim edge: pair (leaves adjacent to 1 or 2 via 0) ...
        full = _got(spark, g)
        guarded = _got(spark, g, max_center_degree=5)
        assert set(guarded) < set(full)
        # pairs surviving the guard: wedges centered at deg<=5 vertices
        assert all(
            any(
                str(w) not in (u, v)
                and g.degree(int(w)) <= 5
                and g.has_edge(int(w), int(u))
                and g.has_edge(int(w), int(v))
                for w in g.nodes()
            )
            for (u, v) in guarded
        )

    def test_invalid_min_common(self, spark):
        g = nx.path_graph(3)
        with pytest.raises(ValueError):
            link_prediction_scores(_edges_df(spark, g), min_common=0)

    def test_self_loops_ignored(self, spark):
        g = nx.path_graph(4)
        rows = [(str(u), str(v)) for u, v in g.edges()] + [("1", "1")]
        e = spark.createDataFrame(rows, "src string, dst string")
        got = {
            (r.u, r.v): r.common for r in link_prediction_scores(e).collect()
        }
        assert got == {("0", "2"): 1, ("1", "3"): 1}
