"""North-rule iterative analytics vs networkx oracles (SURVEY.md §2.6):
PageRank allclose 1e-6, components exact, LPA exact under the pinned
tie-break, triangle count exact + grandiso automorphism cross-check."""

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.components import connected_components
from grandiso_networkx_spark.operators.derive import derive_edges, derive_host_graph
from grandiso_networkx_spark.operators.label_propagation import (
    label_propagation,
    lpa_oracle,
)
from grandiso_networkx_spark.operators.match import find_motifs
from grandiso_networkx_spark.operators.pagerank import pagerank
from grandiso_networkx_spark.operators.triangles import (
    per_vertex_triangles,
    triangle_count,
)
from grandiso_networkx_spark.sources.nx_adapter import nx_to_host
from grandiso_networkx_spark.sources.transcripts import synth_transcripts
from tests.oracles import pagerank_oracle


def _edges_df(spark, g, symmetric=False):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    if symmetric:
        rows = rows + [(str(v), str(u)) for u, v in g.edges() if str(u) != str(v)]
    return spark.createDataFrame(rows, "src string, dst string").distinct()


@pytest.fixture(scope="module")
def transcript_graph(spark):
    t = synth_transcripts(spark, n_convs=120, seed=42)
    edges = derive_edges(t).persist()
    g = nx.DiGraph()
    for r in edges.collect():
        g.add_edge(r.src, r.dst, weight=float(r.weight))
    yield edges, g
    edges.unpersist()


class TestPageRank:
    # oracle = tests.oracles.pagerank_oracle (nx formula; scipy absent)

    @pytest.mark.parametrize("kernel", ["jvm", "arrow"])
    def test_directed_random(self, spark, kernel):
        g = nx.fast_gnp_random_graph(60, 0.08, directed=True, seed=11)
        edge_list = [(str(u), str(v), 1.0) for u, v in g.edges()]
        got = {
            r.id: r.rank
            for r in pagerank(_edges_df(spark, g), tol=1e-10, kernel=kernel).collect()
        }
        want = pagerank_oracle(edge_list, tol=1e-10)
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6, k

    def test_personalized_matches_oracle(self, spark):
        g = nx.fast_gnp_random_graph(50, 0.1, directed=True, seed=9)
        pers = {str(n): (2.0 if n % 3 == 0 else 0.0) for n in g.nodes}
        pdf = spark.createDataFrame(
            list(pers.items()), "id string, weight double"
        )
        got = {
            r.id: r.rank
            for r in pagerank(
                _edges_df(spark, g), tol=1e-10, personalization=pdf
            ).collect()
        }
        want = pagerank_oracle(
            [(str(u), str(v), 1.0) for u, v in g.edges()],
            tol=1e-10,
            personalization=pers,
        )
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6, k

    def test_nstart_matches_oracle_at_fixed_iterations(self, spark):
        # nstart only changes the trajectory, so the parity check pins
        # it where it is observable: after exactly 3 power iterations.
        g = nx.fast_gnp_random_graph(40, 0.12, directed=True, seed=4)
        ns = {str(n): float(n % 5 + 1) for n in g.nodes}
        nsdf = spark.createDataFrame(list(ns.items()), "id string, weight double")
        got = {
            r.id: r.rank
            for r in pagerank(
                _edges_df(spark, g), nstart=nsdf, fixed_iterations=3
            ).collect()
        }
        want = pagerank_oracle(
            [(str(u), str(v), 1.0) for u, v in g.edges()],
            nstart=ns,
            fixed_iter=3,
        )
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-9, k

    def test_nstart_all_zero_raises(self, spark):
        g = nx.DiGraph([("a", "b")])
        zero = spark.createDataFrame([("a", 0.0)], "id string, weight double")
        with pytest.raises(ValueError, match="nstart"):
            pagerank(_edges_df(spark, g), nstart=zero)

    def test_personalization_all_zero_raises(self, spark):
        g = nx.DiGraph([("a", "b")])
        zero = spark.createDataFrame([("a", 0.0)], "id string, weight double")
        with pytest.raises(ValueError, match="personalization"):
            pagerank(_edges_df(spark, g), personalization=zero)

    def test_with_dangling_nodes(self, spark):
        g = nx.DiGraph([("a", "b"), ("b", "c"), ("a", "c"), ("d", "c")])
        got = {r.id: r.rank for r in pagerank(_edges_df(spark, g), tol=1e-12).collect()}
        want = pagerank_oracle(
            [(u, v, 1.0) for u, v in g.edges()], tol=1e-12
        )
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6

    def test_isolated_vertices_via_vertex_table(self, spark):
        g = nx.DiGraph([("a", "b"), ("b", "c")])
        verts = spark.createDataFrame([("a",), ("b",), ("c",), ("iso",)], "id string")
        got = {
            r.id: r.rank
            for r in pagerank(_edges_df(spark, g), tol=1e-12, vertices=verts).collect()
        }
        want = pagerank_oracle(
            [(u, v, 1.0) for u, v in g.edges()],
            nodes={"a", "b", "c", "iso"},
            tol=1e-12,
        )
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6

    def test_undirected_via_symmetrize(self, spark):
        g = nx.karate_club_graph()
        sym = [(str(u), str(v), 1.0) for u, v in g.edges()] + [
            (str(v), str(u), 1.0) for u, v in g.edges()
        ]
        got = {
            r.id: r.rank
            for r in pagerank(_edges_df(spark, g, symmetric=True), tol=1e-10).collect()
        }
        want = pagerank_oracle(sym, tol=1e-10)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6

    def test_weighted_transcript_graph(self, spark, transcript_graph):
        edges, g = transcript_graph
        got = {
            r.id: r.rank
            for r in pagerank(edges, weight_col="weight", tol=1e-10).collect()
        }
        want = pagerank_oracle(
            [(u, v, d["weight"]) for u, v, d in g.edges(data=True)], tol=1e-10
        )
        assert np.allclose(
            [got[k] for k in sorted(want)],
            [want[k] for k in sorted(want)],
            atol=1e-6,
        )


class TestConnectedComponents:
    def test_exact_partition(self, spark):
        g = nx.Graph()
        g.add_edges_from([("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")])
        got = connected_components(_edges_df(spark, g)).collect()
        by_comp = {}
        for r in got:
            by_comp.setdefault(r.component, set()).add(r.id)
        want = {frozenset(c) for c in nx.connected_components(g)}
        assert {frozenset(v) for v in by_comp.values()} == want
        # canonical-min labels
        for comp, members in by_comp.items():
            assert comp == min(members)

    def test_random_graph(self, spark):
        g = nx.random_geometric_graph(80, 0.12, seed=3)
        g = nx.relabel_nodes(g, str)
        got = connected_components(_edges_df(spark, g)).collect()
        by_comp = {}
        for r in got:
            by_comp.setdefault(r.component, set()).add(r.id)
        want = {frozenset(c) for c in nx.connected_components(g) if len(c) > 1}
        got_sets = {frozenset(v) for v in by_comp.values()}
        # isolated vertices have no edges → not in the edge table
        assert got_sets == want


class TestStarContraction:
    def _comp_map(self, rows):
        return {r.id: r.component for r in rows}

    def test_matches_hashmin_on_random(self, spark):
        from grandiso_networkx_spark.operators.components import (
            connected_components_star,
        )

        g = nx.random_geometric_graph(80, 0.12, seed=3)
        g = nx.relabel_nodes(g, str)
        e = _edges_df(spark, g)
        assert self._comp_map(
            connected_components_star(e).collect()
        ) == self._comp_map(connected_components(e).collect())

    def test_high_diameter_path(self, spark):
        # a 300-node path: HashMin needs ~300 rounds, star contraction
        # O(log n) — the case this algorithm exists for
        from grandiso_networkx_spark.operators.components import (
            connected_components_star,
        )

        rows = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(300)]
        e = spark.createDataFrame(rows, "src string, dst string")
        got = connected_components_star(e, max_iter=20).collect()
        assert len(got) == 301
        assert {r.component for r in got} == {"n0000"}

    def test_self_loops_and_two_node_components(self, spark):
        from grandiso_networkx_spark.operators.components import (
            connected_components_star,
        )

        e = spark.createDataFrame(
            [("a", "b"), ("z", "z"), ("x", "y")], "src string, dst string"
        )
        got = self._comp_map(connected_components_star(e).collect())
        assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "z"}


class TestLabelPropagation:
    @pytest.mark.parametrize("seed", [1, 5])
    def test_matches_pinned_oracle(self, spark, seed):
        g = nx.fast_gnp_random_graph(40, 0.1, seed=seed)
        g = nx.relabel_nodes(g, str)
        edge_list = [(u, v) for u, v in g.edges()]
        got = {r.id: r.label for r in label_propagation(_edges_df(spark, g), max_iter=8).collect()}
        want = lpa_oracle(edge_list, max_iter=8)
        assert got == want

    @pytest.mark.parametrize("seed", [2, 7])
    def test_weighted_matches_pinned_oracle(self, spark, seed):
        g = nx.fast_gnp_random_graph(36, 0.12, seed=seed)
        g = nx.relabel_nodes(g, str)
        # Deterministic integer weights so double sums tie exactly.
        wedges = [
            (u, v, float((int(u) * 7 + int(v) * 3) % 5 + 1)) for u, v in g.edges()
        ]
        edf = spark.createDataFrame(wedges, "src string, dst string, weight double")
        got = {
            r.id: r.label
            for r in label_propagation(edf, max_iter=8, weight_col="weight").collect()
        }
        want = lpa_oracle(wedges, max_iter=8, weighted=True)
        assert got == want

    def test_weighted_tie_breaks_to_unweighted_on_unit_weights(self, spark):
        g = nx.fast_gnp_random_graph(30, 0.15, seed=3)
        g = nx.relabel_nodes(g, str)
        edf = spark.createDataFrame(
            [(u, v, 1.0) for u, v in g.edges()], "src string, dst string, weight double"
        )
        got_w = {
            r.id: r.label
            for r in label_propagation(edf, max_iter=6, weight_col="weight").collect()
        }
        got_u = {
            r.id: r.label
            for r in label_propagation(edf.select("src", "dst"), max_iter=6).collect()
        }
        assert got_w == got_u


class TestTriangles:
    def test_karate(self, spark):
        g = nx.karate_club_graph()
        e = _edges_df(spark, g)
        want_total = sum(nx.triangles(g).values()) // 3
        assert triangle_count(e) == want_total
        got_pv = {r.id: r.tri_count for r in per_vertex_triangles(e).collect()}
        for k, v in nx.triangles(g).items():
            if v:
                assert got_pv.get(str(k), 0) == v

    def test_cross_check_with_motif_engine(self, spark):
        g = nx.fast_gnp_random_graph(14, 0.35, seed=9)
        tri = triangle_count(_edges_df(spark, g))
        k3 = find_motifs(nx.complete_graph(3), nx_to_host(spark, g), count_only=True)
        assert k3 == 6 * tri  # automorphism factor, test_grandiso.py:191-204


class TestOnDerivedGraph:
    def test_pipeline_end_to_end(self, spark, transcript_graph):
        edges, g = transcript_graph
        comp = connected_components(edges)
        got = {}
        for r in comp.collect():
            got.setdefault(r.component, set()).add(r.id)
        want = {frozenset(c) for c in nx.connected_components(g.to_undirected())}
        assert {frozenset(v) for v in got.values()} == want
