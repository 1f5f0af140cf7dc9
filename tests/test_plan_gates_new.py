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


class TestPassageVocabSourcePlans:
    def test_passage_dedup_owner_agg_is_partial(self, spark):
        # the corpus-wide passage->owner reduction must map-side combine
        # (a boilerplate passage shared by 10^6 docs collapses per map
        # partition) and never fall back to a cross product
        from grandiso_networkx_spark.operators.dedup import passage_dedup

        docs = spark.createDataFrame(
            [(i, f"a b c d e w{i} x y z q") for i in range(6)],
            "doc_id long, text string",
        )
        plan = _plan(passage_dedup(docs, window=5))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "partial_min" in plan  # groupBy(passage).min owner combine

    def test_vocab_coverage_window_runs_on_top_v_only(self, spark):
        # the global token count must partial-aggregate; the one-partition
        # cumulative window must sit above a TakeOrdered limit, never a
        # full global sort of the vocabulary
        from grandiso_networkx_spark.operators.textstats import vocab_coverage

        docs = spark.createDataFrame(
            [(1, "a a b c"), (2, "a b d e")], "doc_id long, text string"
        )
        plan = _plan(vocab_coverage(docs, top_v=3))
        assert "partial_count" in plan
        assert "TakeOrderedAndProject" in plan

    def test_source_quality_single_scan_partial_aggs(self, spark):
        from grandiso_networkx_spark.operators.textstats import (
            source_quality_rollup,
        )

        docs = spark.createDataFrame(
            [(1, "s1", "a b"), (2, "s1", "a b"), (3, "s2", "c")],
            "doc_id long, source string, text string",
        )
        plan = _plan(source_quality_rollup(docs))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # both the dup-hash reduction and the source rollup combine map-side
        assert "partial_count" in plan


class TestRound2PlanGates:
    def test_duplicate_spans_equi_join_only(self, spark):
        from grandiso_networkx_spark.operators.dedup import duplicate_spans

        docs = spark.createDataFrame(
            [(i, "a b c d e f g h i j") for i in range(5)],
            "doc_id long, text string",
        )
        plan = _plan(duplicate_spans(docs, k=4, max_df=10))
        # gram-bucket pair join must be an equi hash/merge join
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_triad_census_no_cartesian_in_core(self, spark):
        from grandiso_networkx_spark.operators.triads import triad_census

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (2, 1)], "src long, dst long"
        )
        plan = _plan(triad_census(edges))
        # the only cross joins are the 1-row scalar attachments
        # (nv/rest); the triple enumeration itself is equi
        assert "CartesianProduct" not in plan

    def test_temporal_motifs_equi_with_residual(self, spark):
        from grandiso_networkx_spark.operators.temporal import (
            temporal_motif_counts,
        )

        df = spark.createDataFrame(
            [(1, 2, 0.0), (2, 3, 1.0)], "src long, dst long, ts double"
        )
        plan = _plan(temporal_motif_counts(df, 10.0))
        # the delta window must ride the vertex equi join as a
        # residual, never force a time-cross product
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_mutual_knn_single_window_rank(self, spark):
        from grandiso_networkx_spark.operators.similarity import (
            mutual_knn_graph,
        )

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(6)],
            "vec_id long, embedding array<float>",
        )
        plan = _plan(mutual_knn_graph(emb, k=2))
        # the exact baseline's documented shape: one broadcast cross
        # join for scoring, then equi self-join for mutuality
        assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count("BroadcastHashJoin") >= 1


class TestSetsimPlanGates:
    def test_setsim_join_stays_equi(self, spark):
        from grandiso_networkx_spark.operators.dedup import setsim_jaccard_pairs

        docs = spark.createDataFrame(
            [(i, "a b c d e f w%d" % i) for i in range(20)],
            "doc_id long, text string",
        )
        plan = _plan(setsim_jaccard_pairs(docs, threshold=0.8))
        # candidates must meet on the prefix-token equi key and the
        # verify stage on the id equi keys — never a cross product
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
