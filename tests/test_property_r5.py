"""Hypothesis property tests for the remaining draw-inversion kernels
(VERDICT r4 item 5) — the r4 suite's catch rate (a real lossy-prefix
bug in setsim) justifies the same treatment for:

- Weighted / node2vec walk draws: the cumulative-weight inversion at
  ``u = h60(start|rep|step|seed)/2^60`` folded left-to-right over the
  dst-sorted neighbor list must equal a pure-Python mirror doing the
  identical IEEE arithmetic — including integer-weight exact partial
  sums, multi-edge weight summing, the ``cum > target`` strict
  inequality at exact-tie boundaries, and the no-selection fallback to
  the last neighbor (u → 1 with float accumulation).
- Interval/range join bin-bucketing: for ANY bin width the bucketed
  equi-join + residual filter must equal the brute-force O(n·m)
  ``start <= ts < end`` nested loop — intervals exactly on bin
  boundaries, zero-width intervals (empty by [start,end)), negative
  timestamps (floor vs truncate-toward-zero), and left-join
  multiplicity with null padding.

Example counts are small (each example runs Spark jobs); generators
favor adversarial shapes — weights tied everywhere, timestamps pinned
to bin-boundary multiples, zero-width and single-point intervals.
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.rangejoin import interval_join
from grandiso_networkx_spark.operators.walks import weighted_random_walks

PROP_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# -- weighted walk draw inversion -------------------------------------------

# small vertex universe + integer weights 1..4 → heavy ties, exact
# partial sums in double; duplicate (src, dst) rows test multi-edge
# weight summing
WEDGES = st.lists(
    st.tuples(
        st.integers(0, 5), st.integers(0, 5), st.integers(1, 4)
    ),
    min_size=1,
    max_size=14,
)


def _py_weighted_walks(edges, walk_length, walks_per_vertex, seed=42,
                       max_degree=None, directed=True):
    """Pure-Python mirror of weighted_random_walks: identical
    accumulation order and IEEE float ops (Python floats are doubles)."""
    acc: dict = {}
    pairs = []
    for u, v, w in edges:
        pairs.append((u, v, float(w)))
        if not directed:
            pairs.append((v, u, float(w)))
    for u, v, w in pairs:
        if u != v:
            acc[(u, v)] = acc.get((u, v), 0.0) + w
    adj: dict = {}
    for (u, v) in sorted(acc):
        adj.setdefault(u, []).append((v, acc[(u, v)]))
    if max_degree is not None:
        adj = {u: nvs[:max_degree] for u, nvs in adj.items()}
    rows = set()
    for start in adj:
        for rep in range(walks_per_vertex):
            cur = start
            rows.add((start, rep, 0, start))
            for step in range(1, walk_length + 1):
                if cur not in adj:
                    break
                nb = adj[cur]
                tot = 0.0
                for _, wi in nb:
                    tot += wi
                u = _h60(f"{start}|{rep}|{step}|{seed}") / 2.0**60
                target = u * tot
                cum, sel = 0.0, None
                for i, (_, wi) in enumerate(nb):
                    cum += wi
                    if sel is None and cum > target:
                        sel = i
                if sel is None:
                    sel = len(nb) - 1
                cur = nb[sel][0]
                rows.add((start, rep, step, cur))
    return rows


class TestWeightedWalkInversion:
    @settings(**PROP_SETTINGS)
    @given(edges=WEDGES, directed=st.booleans())
    def test_matches_python_mirror(self, spark, edges, directed):
        if all(u == v for u, v, _ in edges):
            return  # no non-loop edges: operator raises on empty adj
        df = spark.createDataFrame(
            [(str(u), str(v), w) for u, v, w in edges],
            "src string, dst string, weight long",
        )
        got = {
            (r["start"], r["rep"], r["step"], r["vertex"])
            for r in weighted_random_walks(
                df, walk_length=3, walks_per_vertex=2, directed=directed
            ).collect()
        }
        want = {
            (str(a), rep, step, str(b))
            for (a, rep, step, b) in _py_weighted_walks(
                edges, 3, 2, directed=directed
            )
        }
        assert got == want

    @settings(**PROP_SETTINGS)
    @given(edges=WEDGES, cap=st.integers(1, 3))
    def test_max_degree_cap_matches(self, spark, edges, cap):
        if all(u == v for u, v, _ in edges):
            return
        df = spark.createDataFrame(
            [(str(u), str(v), w) for u, v, w in edges],
            "src string, dst string, weight long",
        )
        got = {
            (r["start"], r["rep"], r["step"], r["vertex"])
            for r in weighted_random_walks(
                df, walk_length=2, walks_per_vertex=1, max_degree=cap
            ).collect()
        }
        want = {
            (str(a), rep, step, str(b))
            for (a, rep, step, b) in _py_weighted_walks(
                edges, 2, 1, max_degree=cap
            )
        }
        assert got == want


class TestNode2vecInversion:
    @settings(**PROP_SETTINGS)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 5)),
            min_size=1,
            max_size=14,
        ),
        pq=st.sampled_from([(0.25, 4.0), (1.0, 1.0), (2.0, 0.5), (4.0, 0.25)]),
    )
    def test_matches_python_mirror(self, spark, edges, pq):
        from grandiso_networkx_spark.operators.walks import node2vec_walks
        from tests.test_node2vec import _py_node2vec

        e = [(str(u), str(v)) for u, v in edges if u != v]
        if not e:
            return
        p, q = pq
        df = spark.createDataFrame(e, "src string, dst string")
        got = {
            (r["start"], r["rep"], r["step"], r["vertex"])
            for r in node2vec_walks(
                df, p=p, q=q, walk_length=3, walks_per_vertex=2
            ).collect()
        }
        want = _py_node2vec(e, p, q, 3, 2)
        assert got == want


# -- interval join bin edges ------------------------------------------------

# timestamps/bounds pinned near bin-width multiples (including exact
# boundaries and negatives); widths small so intervals span 0..n bins
TS = st.integers(-9, 18)


class TestIntervalJoinBinEdges:
    @settings(**PROP_SETTINGS)
    @given(
        events=st.lists(st.tuples(st.integers(0, 2), TS), min_size=0, max_size=8),
        ivals=st.lists(st.tuples(st.integers(0, 2), TS, TS), min_size=0, max_size=6),
        width=st.sampled_from([1, 2, 3, 7]),
        how=st.sampled_from(["inner", "left"]),
    )
    def test_matches_bruteforce(self, spark, events, ivals, width, how):
        ev = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(events)],
            "k int, ts long, eid int",
        )
        iv = spark.createDataFrame(
            [(k, s, e, j) for j, (k, s, e) in enumerate(ivals)],
            "k int, start long, end long, ivid int",
        )
        canon = lambda pairs: sorted(  # noqa: E731 — None → -1 sentinel
            (i, -1 if j is None else j) for i, j in pairs
        )
        got = canon(
            (r["eid"], r["ivid"])
            for r in interval_join(
                ev, iv, on="k", bin_width=width, how=how, suffix="_iv"
            )
            .select("eid", F.col("ivid_iv").alias("ivid"))
            .collect()
        )
        matched = [
            (i, j)
            for i, (k, t) in enumerate(events)
            for j, (k2, s, e) in enumerate(ivals)
            if k == k2 and s <= t < e
        ]
        want = list(matched)
        if how == "left":
            hit = {i for i, _ in matched}
            want += [(i, None) for i in range(len(events)) if i not in hit]
        assert got == canon(want)
