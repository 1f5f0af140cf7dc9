"""Batched multi-seed personalized PageRank vs the networkx-semantics
oracle: each seed's converged vector must be allclose 1e-6 to
pagerank(personalization={seed: 1.0}) — one Spark loop, k oracles."""

import networkx as nx
import numpy as np
import pytest

from grandiso_networkx_spark.operators.ppr import personalized_pagerank
from tests.oracles import pagerank_oracle


def _edges_df(spark, g, weights=False):
    if weights:
        rows = [(str(u), str(v), float(d.get("weight", 1.0)))
                for u, v, d in g.edges(data=True)]
        return spark.createDataFrame(rows, "src string, dst string, weight double")
    rows = [(str(u), str(v)) for u, v in g.edges()]
    return spark.createDataFrame(rows, "src string, dst string")


def _collect(df):
    out: dict[str, dict[str, float]] = {}
    for r in df.collect():
        out.setdefault(r.seed, {})[r.id] = r.rank
    return out


class TestPPRMulti:
    def test_directed_random_multi_seed(self, spark):
        g = nx.fast_gnp_random_graph(50, 0.08, directed=True, seed=7)
        edges = [(str(u), str(v), 1.0) for u, v in g.edges()]
        seeds = ["0", "7", "23"]
        sdf = spark.createDataFrame([(s,) for s in seeds], "id string")
        # PPR starts at unit seed mass, the oracle at uniform 1/n — same
        # fixed point, different trajectories, so both must be converged
        # well past the 1e-6 comparison tolerance: 120 fixed rounds puts
        # the batch within alpha^120 ~ 3e-9 of the fixed point (and skips
        # the per-round delta job), oracle tol 1e-12 does the same.
        got = _collect(
            personalized_pagerank(_edges_df(spark, g), sdf, fixed_iterations=120)
        )
        for s in seeds:
            want = pagerank_oracle(
                edges, personalization={s: 1.0}, tol=1e-12, max_iter=3000
            )
            mine = got[s]
            for v, r in want.items():
                assert abs(mine.get(v, 0.0) - r) < 1e-6, (s, v)
            # sparse output must not invent vertices
            assert set(mine) <= set(want)

    def test_weighted_and_dangling(self, spark):
        # b and d are dangling (no out-edges) -> mass restarts at seed.
        rows = [("a", "b", 3.0), ("a", "c", 1.0), ("c", "d", 2.0)]
        edges = spark.createDataFrame(rows, "src string, dst string, weight double")
        sdf = spark.createDataFrame([("a",), ("c",)], "id string")
        # Convergence mode on the tiny graph exercises the per-seed L1
        # stop; tol 1e-9 keeps the stopped point within ~1e-7 of the
        # fixed point (err*alpha/(1-alpha) bound).
        got = _collect(
            personalized_pagerank(
                edges, sdf, weight_col="weight", tol=1e-9, max_iter=400
            )
        )
        for s in ("a", "c"):
            want = pagerank_oracle(
                rows, personalization={s: 1.0}, tol=1e-12, max_iter=3000
            )
            for v, r in want.items():
                assert abs(got[s].get(v, 0.0) - r) < 1e-6, (s, v)

    def test_sparse_unreachable_absent(self, spark):
        # two disjoint directed paths; seed in one never scores the other
        rows = [("a", "b"), ("b", "c"), ("x", "y")]
        edges = spark.createDataFrame(rows, "src string, dst string")
        sdf = spark.createDataFrame([("a",)], "id string")
        got = _collect(personalized_pagerank(edges, sdf))
        assert set(got["a"]) == {"a", "b", "c"}

    def test_fixed_iterations_deterministic(self, spark):
        g = nx.fast_gnp_random_graph(30, 0.1, directed=True, seed=3)
        edges = _edges_df(spark, g)
        sdf = spark.createDataFrame([("1",), ("2",)], "id string")
        a = _collect(personalized_pagerank(edges, sdf, fixed_iterations=4))
        b = _collect(personalized_pagerank(edges, sdf, fixed_iterations=4))
        assert a == b
        # mass conservation: each seed's sparse vector sums to 1
        for s, vec in a.items():
            assert abs(sum(vec.values()) - 1.0) < 1e-9

    def test_missing_seed_raises(self, spark):
        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        sdf = spark.createDataFrame([("zz",)], "id string")
        with pytest.raises(ValueError):
            personalized_pagerank(edges, sdf)
