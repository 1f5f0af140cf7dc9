"""Bucketed sink plan-shape tests: a self-join of the bucketed edge
table must run with NO Exchange (co-located buckets), the same join on
plain frames must shuffle, and both must return identical rows."""

import networkx as nx

from grandiso_networkx_spark.sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed_edges,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoins:
    def test_self_join_is_shuffle_free(self, spark, tmp_path):
        g = nx.gnp_random_graph(40, 0.1, seed=4, directed=True)
        edges = spark.createDataFrame(
            [(int(u), int(v)) for u, v in g.edges()], "src long, dst long"
        )
        write_bucketed_edges(
            edges, "e_buck", buckets=4, path=str(tmp_path / "e_buck")
        )
        try:
            t = read_bucketed(spark, "e_buck")
            # wedge enumeration: edges(a->b) join edges(b->c) keyed so
            # BOTH sides join on their bucket column src — rename one
            # side's src to the other's dst
            left = t.selectExpr("src AS a", "dst AS b")
            right = t.selectExpr("src AS b2", "dst AS c")
            wedges = left.join(right, left["b"] == right["b2"])
            # co-located? only the probe side keyed on its bucketed
            # column skips the exchange; assert against the canonical
            # same-key join: group-by on the bucket key is exchange-free
            agg = t.groupBy("src").count()
            assert "Exchange" not in _plan(agg)
            # bucketed-bucketed equi join on the bucket columns:
            j = t.alias("x").join(
                read_bucketed(spark, "e_buck").alias("y"), on="src"
            )
            assert "Exchange" not in _plan(j)
            # contrast: the identical join on plain (unbucketed) frames
            plain = edges.alias("x").join(edges.alias("y"), on="src")
            assert "Exchange" in _plan(plain)
            # value parity
            got = sorted(map(tuple, j.collect()))
            want = sorted(map(tuple, plain.collect()))
            assert got == want
            # wedge join correctness: one row per 2-path a->b->c
            assert wedges.count() == sum(
                g.in_degree(n) * g.out_degree(n) for n in g.nodes()
            )
        finally:
            drop_bucketed(spark, "e_buck")

    def test_sorted_buckets_skip_sort(self, spark, tmp_path):
        edges = spark.createDataFrame(
            [(i % 7, i) for i in range(100)], "src long, dst long"
        )
        write_bucketed_edges(
            edges, "e_sorted", buckets=2, path=str(tmp_path / "e_sorted")
        )
        try:
            t = read_bucketed(spark, "e_sorted")
            j = t.alias("x").join(read_bucketed(spark, "e_sorted").alias("y"), on="src")
            plan = _plan(j)
            assert "Exchange" not in plan
            # SortMergeJoin over pre-sorted buckets needs no Sort node
            if "SortMergeJoin" in plan:
                assert "Sort " not in plan.split("SortMergeJoin")[0]
        finally:
            drop_bucketed(spark, "e_sorted")
