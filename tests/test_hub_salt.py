"""Selective hub salting in expand_step (r5): bit-identical match
sets with salting on vs off, on hosts where the hot-key path actually
engages (planted hub above the degree threshold) and where it doesn't
(threshold higher than any degree → plan must match unsalted
semantics trivially).  Covers K3 (multi-required-edge intersection),
the 2-path (single required edge, fused seed), and attr-constrained
matching through the salted join.
"""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.graph import HostGraph
from grandiso_networkx_spark.operators.match import find_motifs_df
from grandiso_networkx_spark.plans.motif import Motif
from grandiso_networkx_spark.sources.nx_adapter import nx_to_host


def _hub_graph():
    g = nx.fast_gnp_random_graph(40, 0.12, directed=True, seed=11)
    # planted hub: vertex 0 wired to everything, both directions
    for v in range(1, 40):
        g.add_edge(0, v)
        g.add_edge(v, 0)
    return g


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def hub_host(spark):
    return nx_to_host(spark, _hub_graph())


class TestHubSalt:
    def test_triangle_matches_identical(self, spark, hub_host):
        m = Motif(directed=True)
        m.add_edge("A", "B")
        m.add_edge("B", "C")
        m.add_edge("A", "C")
        plain = _rows(find_motifs_df(m, hub_host))
        salted = _rows(
            find_motifs_df(m, hub_host, hub_salt=4, hub_degree_threshold=20)
        )
        assert salted == plain and len(plain) > 0

    def test_two_path_matches_identical(self, spark, hub_host):
        m = Motif(directed=True)
        m.add_edge("A", "B")
        m.add_edge("B", "C")
        plain = _rows(find_motifs_df(m, hub_host))
        salted = _rows(
            find_motifs_df(m, hub_host, hub_salt=4, hub_degree_threshold=20)
        )
        assert salted == plain and len(plain) > 0

    def test_threshold_above_max_degree_is_noop_semantics(self, spark, hub_host):
        m = Motif(directed=True)
        m.add_edge("A", "B")
        m.add_edge("B", "C")
        m.add_edge("A", "C")
        plain = _rows(find_motifs_df(m, hub_host))
        salted = _rows(
            find_motifs_df(
                m, hub_host, hub_salt=8, hub_degree_threshold=10**9
            )
        )
        assert salted == plain

    def test_attr_constrained_through_salted_join(self, spark):
        g = nx.DiGraph()
        for v in range(1, 30):
            g.add_edge(0, v)
            g.add_edge(v, 0)
        for v in range(1, 10):
            g.add_edge(v, v + 1)
        for n in g.nodes:
            g.nodes[n]["kind"] = "even" if int(n) % 2 == 0 else "odd"
        host = nx_to_host(spark, g)
        # host attrs are repr-encoded by nx_to_host; the motif must
        # match that encoding (same convention as nx_motif)
        m = Motif(directed=True)
        m.add_node("A", kind=repr("even"))
        m.add_node("B", kind=repr("odd"))
        m.add_edge("A", "B")
        m.add_edge("B", "A")
        plain = _rows(find_motifs_df(m, host))
        salted = _rows(
            find_motifs_df(m, host, hub_salt=3, hub_degree_threshold=10)
        )
        assert salted == plain and len(plain) > 0


class TestHubSaltPlanGate:
    def test_salted_join_keys_include_salt(self, spark, hub_host):
        """Plan gate: with hub_salt the first expansion join must key
        on (vertex, salt) — the salt columns appear in the join plan,
        so the hub product is split across salt partitions rather than
        landing in one task."""
        m = Motif(directed=True)
        m.add_edge("A", "B")
        m.add_edge("B", "C")
        m.add_edge("A", "C")
        salted = find_motifs_df(
            m, hub_host, hub_salt=4, hub_degree_threshold=20
        )
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "__esalt" in plan and "__fsalt" in plan
        plain = find_motifs_df(m, hub_host)
        pp = plain._jdf.queryExecution().executedPlan().toString()
        assert "__esalt" not in pp and "__fsalt" not in pp
