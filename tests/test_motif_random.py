"""Randomized differential tests vs networkx VF2 — the reference's own
oracle strategy (/root/reference/grandiso/test_grandiso.py:109-174,
:222-361), with a seeded RNG for reproducibility."""

import random

import networkx as nx
import pytest
from networkx.algorithms.isomorphism import DiGraphMatcher, GraphMatcher

from grandiso_networkx_spark.operators.match import find_motifs
from grandiso_networkx_spark.sources.nx_adapter import nx_to_host

RNG = random.Random(20260816)


def _random_motif(rng):
    g = nx.graph_atlas(rng.randint(7, 30))
    while len(list(nx.connected_components(g))) != 1:
        g = nx.graph_atlas(rng.randint(7, 30))
    return nx.relabel_nodes(g, lambda x: str(x + 1))


def _random_host(rng, directed=False, n=20, p=0.1):
    g = nx.fast_gnp_random_graph(n, p, directed=directed, seed=rng.randint(0, 2**31))
    comp = nx.weakly_connected_components if directed else nx.connected_components
    while len(list(comp(g))) != 1:
        g = nx.fast_gnp_random_graph(
            n, p, directed=directed, seed=rng.randint(0, 2**31)
        )
    return nx.relabel_nodes(g, lambda x: str(x + 1))


def _random_directed_motif(rng):
    motif = _random_motif(rng)
    d = nx.DiGraph()
    for u, v in motif.edges():
        d.add_edge(*rng.choice([(u, v), (v, u)]))
    return d


FIXED_MOTIFS = {
    "rect": nx.DiGraph([("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")]),
    "tri": nx.DiGraph([("A", "B"), ("B", "C"), ("C", "A")]),
    "two_hop": nx.DiGraph([("A", "B"), ("B", "C")]),
    "fan4": nx.DiGraph([("A", "B"), ("A", "C"), ("A", "D"), ("A", "E")]),
}


class TestFixedMotifsRandomHosts:
    # test_grandiso.py:109-174 (directed) and :222-287 (undirected)
    @pytest.mark.parametrize("name", list(FIXED_MOTIFS))
    @pytest.mark.parametrize("p", [0.3, 0.5])
    def test_directed(self, spark, name, p):
        host = nx.fast_gnp_random_graph(10, p, directed=True, seed=RNG.randint(0, 2**31))
        motif = FIXED_MOTIFS[name]
        expected = sum(1 for _ in DiGraphMatcher(host, motif).subgraph_monomorphisms_iter())
        got = find_motifs(motif, nx_to_host(spark, host), count_only=True)
        assert got == expected

    @pytest.mark.parametrize("name", list(FIXED_MOTIFS))
    def test_undirected(self, spark, name):
        host = nx.fast_gnp_random_graph(10, 0.5, directed=False, seed=RNG.randint(0, 2**31))
        motif = FIXED_MOTIFS[name].to_undirected()
        expected = sum(1 for _ in GraphMatcher(host, motif).subgraph_monomorphisms_iter())
        got = find_motifs(motif, nx_to_host(spark, host), count_only=True)
        assert got == expected


_iso_undir = [(_random_host(RNG, False), _random_motif(RNG)) for _ in range(5)]
_iso_dir = [(_random_host(RNG, True), _random_directed_motif(RNG)) for _ in range(15)]
_mono_undir = [(_random_host(RNG, False), _random_motif(RNG)) for _ in range(5)]
_mono_dir = [(_random_host(RNG, True), _random_directed_motif(RNG)) for _ in range(15)]


class TestRandomGraphIsomorphisms:
    # test_grandiso.py:324-341
    @pytest.mark.parametrize("host,motif", _iso_undir)
    def test_undirected(self, spark, host, motif):
        expected = sum(1 for _ in GraphMatcher(host, motif).subgraph_isomorphisms_iter())
        got = find_motifs(
            motif, nx_to_host(spark, host), isomorphisms_only=True, count_only=True
        )
        assert got == expected

    @pytest.mark.parametrize("host,motif", _iso_dir)
    def test_directed(self, spark, host, motif):
        expected = sum(1 for _ in DiGraphMatcher(host, motif).subgraph_isomorphisms_iter())
        got = find_motifs(
            motif,
            nx_to_host(spark, host),
            directed=True,
            isomorphisms_only=True,
            count_only=True,
        )
        assert got == expected


class TestRandomGraphMonomorphisms:
    # test_grandiso.py:344-361
    @pytest.mark.parametrize("host,motif", _mono_undir)
    def test_undirected(self, spark, host, motif):
        expected = sum(1 for _ in GraphMatcher(host, motif).subgraph_monomorphisms_iter())
        got = find_motifs(motif, nx_to_host(spark, host), count_only=True)
        assert got == expected

    @pytest.mark.parametrize("host,motif", _mono_dir)
    def test_directed(self, spark, host, motif):
        expected = sum(1 for _ in DiGraphMatcher(host, motif).subgraph_monomorphisms_iter())
        got = find_motifs(
            motif, nx_to_host(spark, host), directed=True, count_only=True
        )
        assert got == expected
