"""Randomized differential tests for ATTRIBUTE-constrained motif
search (VERDICT r2 stretch item 9): atlas-derived motifs with random
attrs on nodes AND edges vs networkx VF2 with grandiso's subset-match
rule — the handcrafted cases in tests/test_hints_limits_attrs.py pin
the semantics; this class sweeps them across seeded random instances
in both directed/undirected and mono/iso modes.

Subset rule (the reference's ``grandiso/__init__.py`` candidate
filter): every attr the MOTIF specifies must be present with an equal
value on the host node/edge; extra host attrs are fine.  That is NOT
``categorical_*_match`` (which defaults missing attrs) — the oracle
lambdas below encode the subset rule directly.
"""

import random

import networkx as nx
import pytest
from networkx.algorithms.isomorphism import DiGraphMatcher, GraphMatcher

from grandiso_networkx_spark.operators.match import find_motifs
from grandiso_networkx_spark.sources.nx_adapter import nx_to_host

RNG = random.Random(20260821)

COLORS = ["red", "green", "blue"]
RELS = ["x", "y"]


def _subset(h_attrs, m_attrs):
    return all(h_attrs.get(k) == v for k, v in m_attrs.items())


def _random_attred_host(rng, directed):
    g = nx.fast_gnp_random_graph(
        11, 0.3, directed=directed, seed=rng.randint(0, 2**31)
    )
    g = nx.relabel_nodes(g, lambda x: str(x + 1))
    for n in g.nodes:
        if rng.random() < 0.8:
            g.nodes[n]["color"] = rng.choice(COLORS)
        if rng.random() < 0.3:
            g.nodes[n]["extra"] = rng.randint(0, 3)
    for u, v in g.edges:
        if rng.random() < 0.7:
            g.edges[u, v]["rel"] = rng.choice(RELS)
    return g


def _random_attred_motif(rng, directed):
    g = nx.graph_atlas(rng.randint(3, 13))
    while (
        len(g) < 2
        or len(g.edges) == 0
        or len(list(nx.connected_components(g))) != 1
    ):
        g = nx.graph_atlas(rng.randint(3, 13))
    g = nx.relabel_nodes(g, lambda x: f"m{x}")
    if directed:
        d = nx.DiGraph()
        for u, v in g.edges():
            d.add_edge(*rng.choice([(u, v), (v, u)]))
        g = d
    for n in g.nodes:
        if rng.random() < 0.4:
            g.nodes[n]["color"] = rng.choice(COLORS)
    for u, v in g.edges:
        if rng.random() < 0.4:
            g.edges[u, v]["rel"] = rng.choice(RELS)
    return g


_dir_cases = [
    (_random_attred_host(RNG, True), _random_attred_motif(RNG, True))
    for _ in range(8)
]
_undir_cases = [
    (_random_attred_host(RNG, False), _random_attred_motif(RNG, False))
    for _ in range(4)
]


class TestRandomAttrMonomorphisms:
    @pytest.mark.parametrize("host,motif", _dir_cases)
    def test_directed(self, spark, host, motif):
        expected = sum(
            1
            for _ in DiGraphMatcher(
                host, motif, node_match=_subset, edge_match=_subset
            ).subgraph_monomorphisms_iter()
        )
        got = find_motifs(
            motif, nx_to_host(spark, host), directed=True, count_only=True
        )
        assert got == expected

    @pytest.mark.parametrize("host,motif", _undir_cases)
    def test_undirected(self, spark, host, motif):
        expected = sum(
            1
            for _ in GraphMatcher(
                host, motif, node_match=_subset, edge_match=_subset
            ).subgraph_monomorphisms_iter()
        )
        got = find_motifs(motif, nx_to_host(spark, host), count_only=True)
        assert got == expected


class TestRandomAttrIsomorphisms:
    @pytest.mark.parametrize("host,motif", _dir_cases[:4])
    def test_directed(self, spark, host, motif):
        expected = sum(
            1
            for _ in DiGraphMatcher(
                host, motif, node_match=_subset, edge_match=_subset
            ).subgraph_isomorphisms_iter()
        )
        got = find_motifs(
            motif,
            nx_to_host(spark, host),
            directed=True,
            isomorphisms_only=True,
            count_only=True,
        )
        assert got == expected

    @pytest.mark.parametrize("host,motif", _undir_cases[:2])
    def test_undirected(self, spark, host, motif):
        expected = sum(
            1
            for _ in GraphMatcher(
                host, motif, node_match=_subset, edge_match=_subset
            ).subgraph_isomorphisms_iter()
        )
        got = find_motifs(
            motif,
            nx_to_host(spark, host),
            isomorphisms_only=True,
            count_only=True,
        )
        assert got == expected


def test_at_least_one_case_is_nontrivial():
    """Guard against a vacuous sweep: some directed case must have a
    nonzero expected count AND some case must have attrs on both a
    node and an edge of the motif."""
    any_nonzero = False
    any_attred = False
    for host, motif in _dir_cases:
        if any(motif.nodes[n] for n in motif.nodes) and any(
            motif.edges[e] for e in motif.edges
        ):
            any_attred = True
        if (
            sum(
                1
                for _ in DiGraphMatcher(
                    host, motif, node_match=_subset, edge_match=_subset
                ).subgraph_monomorphisms_iter()
            )
            > 0
        ):
            any_nonzero = True
    assert any_nonzero and any_attred
