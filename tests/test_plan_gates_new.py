"""Plan-shape gates for the newer operators: the physical plans must
keep the properties their docstrings promise (broadcasts where
promised, no nested-loop/cartesian fallbacks, bounded exchanges) —
regressions here are scale bugs even when row-level results stay
correct."""

import networkx as nx
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.asof import asof_join
from grandiso_networkx_spark.operators.rangejoin import interval_join
from grandiso_networkx_spark.operators.textstats import ngram_contamination


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanGates:
    def test_contamination_broadcasts_bench_grams(self, spark):
        docs = spark.createDataFrame(
            [(i, "w%d x y z a b c d e" % i) for i in range(30)],
            "doc_id long, text string",
        )
        bench = docs.where(F.col("doc_id") % 7 == 0)
        plan = _plan(ngram_contamination(docs, bench, n=4))
        # the bench gram set must go over a broadcast join even with
        # autoBroadcastJoinThreshold=-1 (explicit hint in the operator)
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_interval_join_no_nested_loop(self, spark):
        ev = spark.createDataFrame(
            [(1, 10, "e")], "uid long, ts long, ev string"
        )
        iv = spark.createDataFrame(
            [(1, 0, 20, "w")], "uid long, start long, end long, label string"
        )
        plan = _plan(interval_join(ev, iv, on="uid", bin_width=16))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_asof_join_single_shuffle(self, spark):
        left = spark.createDataFrame(
            [(1, 10, "e")], "uid long, ts long, ev string"
        )
        right = spark.createDataFrame(
            [(1, 5, "s")], "uid long, ts long, snap string"
        )
        plan = _plan(asof_join(left, right, on="uid"))
        # union-sort-carry: exactly one Exchange (the window partition)
        assert plan.count("Exchange") == 1
        assert "Join" not in plan  # no join operator at all

    def test_wedge_self_join_stays_equi(self, spark):
        # neighborhood-minhash banded pairs must meet through equi
        # joins on the band key, never a cross product
        from grandiso_networkx_spark.operators.neighbor_minhash import (
            neighbor_similarity_pairs,
        )

        g = nx.gnp_random_graph(12, 0.3, seed=1)
        df = spark.createDataFrame(
            [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
        )
        plan = _plan(neighbor_similarity_pairs(df, num_hashes=8, bands=4))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
