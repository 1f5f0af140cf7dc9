"""Plan-shape gates for the second round-2 op batch: no
cartesian/nested-loop fallbacks, promised broadcasts, bounded
exchanges — scale properties the docstrings claim."""

import networkx as nx
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _edges_df(spark, g):
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


class TestPlanGatesR2B:
    def test_sparsify_no_cartesian(self, spark):
        from grandiso_networkx_spark.operators.sparsify import (
            sparsify_similarity,
        )

        g = nx.fast_gnp_random_graph(20, 0.2, seed=3)
        plan = _plan(sparsify_similarity(_edges_df(spark, g)))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_neighbor_sample_one_join_per_hop(self, spark):
        from grandiso_networkx_spark.operators.sampling import neighbor_sample

        g = nx.fast_gnp_random_graph(20, 0.2, seed=5)
        seeds = spark.createDataFrame([("0",), ("1",)], "id string")
        # per-hop blocks are checkpointed; the FINAL hop's plan shows
        # one equi join (frontier onto adjacency) and no cross product
        df = neighbor_sample(_edges_df(spark, g), seeds, [2, 2])
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bigram_model_broadcasts_marginals(self, spark):
        from grandiso_networkx_spark.operators.lmscore import bigram_logprob

        docs = spark.createDataFrame(
            [(i, "a b c a b d e") for i in range(10)],
            "doc_id long, text string",
        )
        plan = _plan(bigram_logprob(docs))
        # the model + context marginals ride broadcast joins
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan

    def test_token_ids_broadcasts_vocab(self, spark):
        from grandiso_networkx_spark.operators.tokenize import token_ids

        docs = spark.createDataFrame(
            [(i, "a b c d") for i in range(10)], "doc_id long, text string"
        )
        plan = _plan(token_ids(docs, max_vocab=8))
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_partition_agreement_contingency_shape(self, spark):
        from grandiso_networkx_spark.operators.community import (
            partition_agreement,
        )

        p = spark.createDataFrame(
            [(str(i), str(i % 3)) for i in range(12)], "id string, label string"
        )
        df = partition_agreement(p, p)
        plan = _plan(df)
        # the |V|-sized id join must be an equi join (the deliberate
        # 1-row scalar attaches appear as cartesians when broadcast is
        # disabled in the tiny-fixture test profile — those are fine)
        assert any(
            j in plan
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        )

    def test_pack_sequences_single_exchange_at_scale_config(self, spark):
        from grandiso_networkx_spark.operators.packing import pack_sequences

        docs = spark.createDataFrame(
            [(i, "w " * (i % 9 + 1)) for i in range(40)],
            "doc_id long, text string",
        )
        plan = _plan(pack_sequences(docs, 16, n_shards=8))
        assert plan.count("Exchange") == 1  # the shard hash partition
        assert "SortMergeJoin" not in plan and "Join" not in plan
