"""Earliest-arrival time-respecting reachability vs an exact python
Bellman-Ford-on-arrival-times oracle; plus the hand cases that separate
temporal from static reachability."""

import random

import pytest

from grandiso_networkx_spark.operators.temporal import earliest_arrival


def _oracle(edges, source, start=0):
    arr = {source: start}
    changed = True
    while changed:
        changed = False
        for u, v, t in edges:
            if u in arr and t >= arr[u] and (v not in arr or t < arr[v]):
                arr[v] = t
                changed = True
    return arr


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string, ts long")


class TestTemporalReach:
    def test_time_ordering_blocks_static_path(self, spark):
        # a->b at t=10, b->c at t=5: statically reachable, temporally not
        edges = [("a", "b", 10), ("b", "c", 5)]
        got = {r.id: r.arr for r in earliest_arrival(_df(spark, edges), "a").collect()}
        assert got == {"a": 0, "b": 10}

    def test_longer_path_wins_when_time_respecting(self, spark):
        # direct a->c at t=100; a->b (1) -> c (2) arrives earlier
        edges = [("a", "c", 100), ("a", "b", 1), ("b", "c", 2)]
        got = {r.id: r.arr for r in earliest_arrival(_df(spark, edges), "a").collect()}
        assert got["c"] == 2

    def test_equal_times_allowed(self, spark):
        edges = [("a", "b", 7), ("b", "c", 7)]
        got = {r.id: r.arr for r in earliest_arrival(_df(spark, edges), "a").collect()}
        assert got["c"] == 7

    def test_start_ts_gates_first_hop(self, spark):
        edges = [("a", "b", 3), ("a", "b", 9)]
        got = {
            r.id: r.arr
            for r in earliest_arrival(_df(spark, edges), "a", start_ts=5).collect()
        }
        assert got["b"] == 9

    def test_random_vs_oracle(self, spark):
        rng = random.Random(23)
        nodes = [f"n{i}" for i in range(25)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes), rng.randint(0, 50))
            for _ in range(120)
        ]
        edges = [(u, v, t) for u, v, t in edges if u != v]
        src = "n0"
        got = {
            r.id: r.arr
            for r in earliest_arrival(_df(spark, edges), src).collect()
        }
        assert got == _oracle(edges, src)

    def test_fixed_rounds_prefix_semantics(self, spark):
        # chain with increasing times: after k rounds exactly k+1 hops known
        edges = [(f"v{i}", f"v{i+1}", i + 1) for i in range(10)]
        got = {
            r.id: r.arr
            for r in earliest_arrival(
                _df(spark, edges), "v0", fixed_rounds=3
            ).collect()
        }
        assert set(got) == {"v0", "v1", "v2", "v3"}

    def test_nonconvergence_raises(self, spark):
        edges = [(f"v{i}", f"v{i+1}", i + 1) for i in range(8)]
        with pytest.raises(RuntimeError):
            earliest_arrival(_df(spark, edges), "v0", max_iter=3)
