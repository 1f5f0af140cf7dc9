"""Hints, limits, iterator, and attribute semantics — ported from
/root/reference/grandiso/test_grandiso.py:374-554."""

import networkx as nx
import pytest
from networkx.algorithms.isomorphism import GraphMatcher

from grandiso_networkx_spark.operators.match import (
    find_motifs,
    find_motifs_iter,
)
from grandiso_networkx_spark.sources.nx_adapter import nx_to_host


def _cycle3(cls, names):
    g = cls()
    nx.add_path(g, list(names) + [names[0]])
    return g


class TestHints:
    # test_grandiso.py:379-382
    def test_empty_hints_is_full_search(self, spark):
        host = nx.fast_gnp_random_graph(8, 0.4, seed=7)
        motif = nx.Graph([("a", "b"), ("b", "c"), ("c", "a")])
        expected = sum(
            1 for _ in GraphMatcher(host, motif).subgraph_monomorphisms_iter()
        )
        got = find_motifs(motif, nx_to_host(spark, host), count_only=True, hints=[])
        assert got == expected

    # test_grandiso.py:384-394
    def test_broken_hints_have_no_results(self, spark):
        host = nx_to_host(spark, _cycle3(nx.DiGraph, "ABC"))
        motif = _cycle3(nx.DiGraph, "ABC")
        assert (
            find_motifs(motif, host, count_only=True, hints=[{"A": "A", "B": "A"}]) == 0
        )
        assert (
            find_motifs(motif, host, count_only=True, hints=[{"A": "A", "B": "C"}]) == 0
        )

    def test_hint_internal_edge_is_verified(self, spark):
        """A motif edge between two hint-bound nodes must be checked
        against the host even though no expansion round joins on it —
        the reference verifies every motif edge on complete maps
        (grandiso/__init__.py:300-319)."""
        host_nx = nx.DiGraph([("S", "P"), ("Q", "R"), ("R", "T")])
        host = nx_to_host(spark, host_nx)
        motif = nx.DiGraph()
        nx.add_path(motif, ["a", "b", "c"])
        # No host edge P->Q: expansion from b=Q still finds c=R, but the
        # hint-internal a->b edge is unsatisfied -> 0 matches.
        assert (
            find_motifs(motif, host, count_only=True, hints=[{"a": "P", "b": "Q"}])
            == 0
        )
        # Positive control: Q->R exists, c binds to T -> exactly 1.
        assert (
            find_motifs(motif, host, count_only=True, hints=[{"a": "Q", "b": "R"}])
            == 1
        )

    # test_grandiso.py:396-410
    def test_some_hints_have_values(self, spark):
        host = nx_to_host(spark, _cycle3(nx.DiGraph, "ABC"))
        motif = _cycle3(nx.DiGraph, "ABC")
        assert (
            find_motifs(
                motif,
                host,
                count_only=True,
                hints=[{"A": "A", "B": "C"}, {"A": "A", "B": "B"}],
            )
            == 1
        )

    # test_grandiso.py:412-421 — overlapping hints double-count
    def test_basic_hints(self, spark):
        host = nx_to_host(spark, _cycle3(nx.DiGraph, "ABC"))
        motif = _cycle3(nx.DiGraph, "abc")
        assert find_motifs(motif, host, count_only=True, hints=[{"a": "A"}]) == 1
        assert (
            find_motifs(motif, host, count_only=True, hints=[{"a": "A"}, {"b": "A"}])
            == 2
        )


class TestLimits:
    # test_grandiso.py:424-443
    def test_limits(self, spark):
        host = nx_to_host(spark, nx.complete_graph(8))
        motif = nx.complete_graph(3)
        assert find_motifs(motif, host, count_only=True, limit=0) == 336
        assert find_motifs(motif, host, count_only=True, limit=1) == 1
        assert len(find_motifs(motif, host, limit=300)) == 300
        assert find_motifs(motif, host, count_only=True, limit=338) == 336


class TestIterator:
    # test_grandiso.py:446-462
    def test_iter_all(self, spark):
        host = nx_to_host(spark, nx.complete_graph(8))
        motif = nx.complete_graph(3)
        assert len(list(find_motifs_iter(motif, host))) == 336

    def test_can_get_next_result(self, spark):
        host = nx_to_host(spark, nx.complete_graph(8))
        motif = nx.complete_graph(3)
        result = next(find_motifs_iter(motif, host))
        assert isinstance(result, dict)
        assert set(result.keys()) == {0, 1, 2}

    def test_fails_on_invalid_hint(self, spark):
        host = nx_to_host(spark, nx.complete_graph(8))
        motif = nx.complete_graph(3)
        with pytest.raises(Exception):
            next(find_motifs_iter(motif, host, hints=[{"F": "X"}]))


class TestAttributes:
    # test_grandiso.py:466-477
    def test_node_attributes(self, spark):
        host = _cycle3(nx.DiGraph, "ABC")
        host.add_node("A", flavor="chocolate")
        host.add_node("B", flavor="coffee")
        host.add_node("C", flavor="lint")
        motif = _cycle3(nx.DiGraph, "abc")
        motif.add_node("b", flavor="chocolate")
        assert find_motifs(motif, nx_to_host(spark, host), count_only=True) == 1

    # test_grandiso.py:479-490
    def test_edge_attributes(self, spark):
        host = _cycle3(nx.DiGraph, "ABC")
        host.add_edge("A", "B", flavor="chocolate")
        host.add_edge("B", "C", flavor="coffee")
        host.add_edge("C", "A", flavor="lint")
        motif = _cycle3(nx.DiGraph, "abc")
        motif.add_edge("a", "b", flavor="chocolate")
        assert find_motifs(motif, nx_to_host(spark, host)) == [
            {"a": "A", "b": "B", "c": "C"}
        ]

    # test_grandiso.py:492-507
    def test_node_and_edge_attributes_no_match(self, spark):
        host = _cycle3(nx.DiGraph, "ABC")
        host.add_edge("A", "B", flavor="chocolate")
        host.add_edge("B", "C", flavor="coffee")
        host.add_edge("C", "A", flavor="lint")
        host.add_node("A", flavor="chocolate")
        host.add_node("B", flavor="coffee")
        host.add_node("C", flavor="lint")
        motif = _cycle3(nx.DiGraph, "abc")
        motif.add_edge("a", "b", flavor="coffee")
        motif.add_node("c", flavor="lint")
        assert find_motifs(motif, nx_to_host(spark, host)) == []

    # test_grandiso.py:509-523
    def test_attr_not_in_node(self, spark):
        host = _cycle3(nx.DiGraph, "ABC")
        motif = nx.DiGraph()
        motif.add_edge("a", "b")
        motif.add_node("a", flavor="coffee")
        assert find_motifs(motif, nx_to_host(spark, host)) == []

    # test_grandiso.py:525-538
    def test_attr_not_in_edge(self, spark):
        host = _cycle3(nx.DiGraph, "ABC")
        motif = nx.DiGraph()
        motif.add_edge("a", "b", type="delicious")
        assert find_motifs(motif, nx_to_host(spark, host)) == []

    # attr value types stay distinct under repr-encoding
    def test_attr_type_distinction(self, spark):
        host = nx.DiGraph()
        host.add_edge("A", "B")
        host.add_node("A", n=1)
        host.add_node("B", n="1")
        motif = nx.DiGraph()
        motif.add_edge("a", "b")
        motif.add_node("a", n=1)
        motif.add_node("b", n=1)
        assert find_motifs(motif, nx_to_host(spark, host), count_only=True) == 0
