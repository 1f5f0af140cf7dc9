"""DAG levels + graph coarsening vs networkx / hand oracles."""

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.components import connected_components
from grandiso_networkx_spark.operators.dag import (
    coarsen_graph,
    longest_path_levels,
)

RNG = random.Random(20260819)


def _nx_levels(g: nx.DiGraph) -> dict:
    """level(v) = longest directed path length ending at v (DP over a
    topological order)."""
    lvl = {v: 0 for v in g}
    for v in nx.topological_sort(g):
        for u in g.predecessors(v):
            lvl[v] = max(lvl[v], lvl[u] + 1)
    return lvl


def _edges_df(spark, g):
    return spark.createDataFrame(
        [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
    )


class TestLongestPathLevels:
    @pytest.mark.parametrize("n,p,seed", [(12, 0.25, 1), (20, 0.2, 2), (30, 0.12, 3)])
    def test_random_dag(self, spark, n, p, seed):
        base = nx.fast_gnp_random_graph(n, p, directed=True, seed=seed)
        # orient every edge low->high: acyclic by construction
        g = nx.DiGraph((min(u, v), max(u, v)) for u, v in base.edges() if u != v)
        got = {
            r["id"]: r["level"]
            for r in longest_path_levels(_edges_df(spark, g)).collect()
        }
        assert got == {str(v): l for v, l in _nx_levels(g).items()}

    def test_chain_and_diamond(self, spark):
        g = nx.DiGraph([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
        got = {
            r["id"]: r["level"]
            for r in longest_path_levels(_edges_df(spark, g)).collect()
        }
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_cycle_raises(self, spark):
        g = nx.DiGraph([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
        with pytest.raises(ValueError, match="cycle"):
            longest_path_levels(_edges_df(spark, g))

    def test_two_cycle_raises(self, spark):
        g = nx.DiGraph([("a", "b"), ("b", "a")])
        with pytest.raises(ValueError, match="cycle"):
            longest_path_levels(_edges_df(spark, g))

    def test_unroll_window_exact(self, spark):
        """Any unroll width lands on the same fixpoint."""
        g = nx.DiGraph(
            (min(u, v), max(u, v))
            for u, v in nx.fast_gnp_random_graph(
                18, 0.25, directed=True, seed=7
            ).edges()
            if u != v
        )
        e = _edges_df(spark, g)
        ref = sorted(map(tuple, longest_path_levels(e, unroll=1).collect()))
        for u in (2, 3, 7):
            assert sorted(map(tuple, longest_path_levels(e, unroll=u).collect())) == ref


class TestCoarsenGraph:
    def test_quotient_by_hand(self, spark):
        e = spark.createDataFrame(
            [("a", "b", 2.0), ("b", "c", 1.0), ("c", "d", 5.0), ("a", "d", 1.0)],
            "src string, dst string, w double",
        )
        lab = spark.createDataFrame(
            [("a", "L"), ("b", "L"), ("c", "R"), ("d", "R")],
            "id string, label string",
        )
        got = {
            (r["src_label"], r["dst_label"]): (r["edge_count"], r["weight"])
            for r in coarsen_graph(e, lab, weight_col="w").collect()
        }
        assert got == {
            ("L", "L"): (1, 2.0),
            ("L", "R"): (2, 2.0),
            ("R", "R"): (1, 5.0),
        }

    def test_drop_self_loops_and_multiplicity(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
        )
        lab = spark.createDataFrame(
            [("a", "x"), ("b", "x"), ("c", "y")], "id string, label string"
        )
        got = {
            (r["src_label"], r["dst_label"]): r["weight"]
            for r in coarsen_graph(e, lab, drop_self_loops=True).collect()
        }
        assert got == {("x", "y"): 1.0}

    def test_missing_label_raises(self, spark):
        e = spark.createDataFrame([("a", "b")], "src string, dst string")
        lab = spark.createDataFrame([("a", "x")], "id string, label string")
        with pytest.raises(ValueError, match="label"):
            coarsen_graph(e, lab)

    def test_components_quotient_is_loop_only(self, spark):
        """Coarsening by connected-component labels leaves no
        cross-label edges — the quotient of a partition into
        components is pure self-loops."""
        base = nx.fast_gnp_random_graph(40, 0.05, seed=11)
        e = spark.createDataFrame(
            [(str(u), str(v)) for u, v in base.edges()], "src string, dst string"
        )
        labels = connected_components(e).select(
            "id", F.col("component").alias("label")
        )
        off_diag = (
            coarsen_graph(e, labels, drop_self_loops=True).count()
        )
        assert off_diag == 0
