"""Partition quality vs networkx: modularity exactly
(nx.algorithms.community.modularity), conductance per community
(nx.algorithms.cuts.conductance), weighted + unweighted."""

import networkx as nx
import pytest
from networkx.algorithms import community as nxc
from networkx.algorithms.cuts import conductance as nx_conductance

from grandiso_networkx_spark.operators.community import (
    modularity,
    partition_agreement,
    partition_quality,
)


def _fixture(spark, weighted: bool, seed: int = 9):
    g = nx.gnp_random_graph(30, 0.15, seed=seed)
    if weighted:
        for i, (u, v) in enumerate(g.edges()):
            g[u][v]["weight"] = 1.0 + (i % 5) * 0.5
    rows = [
        (str(u), str(v), float(g[u][v].get("weight", 1.0)))
        for u, v in g.edges()
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, weight double")
    labels = spark.createDataFrame(
        [(str(n), f"c{n % 3}") for n in g.nodes()], "id string, label string"
    )
    parts = [
        {n for n in g.nodes() if n % 3 == k} for k in range(3)
    ]
    return g, edges, labels, parts


class TestModularity:
    @pytest.mark.parametrize("weighted", [False, True])
    def test_vs_networkx(self, spark, weighted):
        g, edges, labels, parts = _fixture(spark, weighted)
        wc = "weight" if weighted else None
        (row,) = modularity(edges, labels, weight_col=wc).collect()
        want = nxc.modularity(
            g, parts, weight="weight" if weighted else None
        )
        assert abs(row.modularity - want) < 1e-6

    def test_resolution(self, spark):
        g, edges, labels, parts = _fixture(spark, False)
        (row,) = modularity(edges, labels, resolution=2.0).collect()
        want = nxc.modularity(g, parts, weight=None, resolution=2.0)
        assert abs(row.modularity - want) < 1e-6

    def test_empty_edges_raises(self, spark):
        edges = spark.createDataFrame([], "src string, dst string")
        labels = spark.createDataFrame([("a", "c0")], "id string, label string")
        with pytest.raises(ValueError):
            modularity(edges, labels)


class TestPartitionQuality:
    def test_conductance_and_volume(self, spark):
        g, edges, labels, parts = _fixture(spark, True)
        got = {
            r.label: r
            for r in partition_quality(
                edges, labels, weight_col="weight"
            ).collect()
        }
        for k, part in enumerate(parts):
            rest = set(g.nodes()) - part
            want_c = nx_conductance(g, part, rest, weight="weight")
            r = got[f"c{k}"]
            assert r.n_vertices == len(part)
            assert abs(r.conductance - want_c) < 1e-5, k
            want_vol = sum(
                d for _, d in g.degree(part, weight="weight")
            )
            assert abs(r.volume - want_vol) < 1e-5
            assert abs(2 * r.internal_w + r.cut_w - r.volume) < 1e-5

    def test_whole_graph_community_null_conductance(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        labels = spark.createDataFrame(
            [("a", "all"), ("b", "all"), ("c", "all")],
            "id string, label string",
        )
        (row,) = partition_quality(edges, labels).collect()
        assert row.cut_w == 0.0 and row.conductance is None


class TestLouvain:
    def _run(self, spark, edge_list, **kw):
        from grandiso_networkx_spark.operators.community import (
            louvain_communities,
        )

        edges = spark.createDataFrame(
            [(str(u), str(v)) for u, v in edge_list], "src string, dst string"
        )
        return {
            r.id: r.community
            for r in louvain_communities(edges, **kw).collect()
        }

    def test_two_cliques_bridge(self, spark):
        k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
        got = self._run(spark, k1 + k2 + [(0, 10)])
        comms = {}
        for n, c in got.items():
            comms.setdefault(c, set()).add(n)
        assert sorted(
            sorted(v) for v in comms.values()
        ) == [
            sorted(str(i) for i in range(5)),
            sorted(str(i) for i in range(10, 15)),
        ]

    def test_ring_of_cliques(self, spark):
        edges = []
        for c in range(4):
            base = 10 * c
            edges += [
                (base + a, base + b) for a in range(5) for b in range(a + 1, 5)
            ]
            edges.append((base, 10 * ((c + 1) % 4) + 1))
        got = self._run(spark, edges)
        comms = {}
        for n, c in got.items():
            comms.setdefault(c, set()).add(n)
        want = [
            {str(10 * c + i) for i in range(5)} for c in range(4)
        ]
        assert sorted(map(sorted, comms.values())) == sorted(map(sorted, want))

    def test_matches_single_node_oracle_bit_for_bit(self, spark):
        from grandiso_networkx_spark.operators.community import louvain_oracle

        for seed in (3, 11):
            g = nx.gnp_random_graph(40, 0.12, seed=seed)
            edge_list = [(str(u), str(v)) for u, v in g.edges()]
            got = self._run(spark, edge_list)
            want = louvain_oracle(edge_list)
            assert got == want

    def test_deterministic_and_improves_modularity(self, spark):
        g = nx.gnp_random_graph(35, 0.15, seed=5)
        edge_list = [(str(u), str(v)) for u, v in g.edges()]
        a = self._run(spark, edge_list)
        b = self._run(spark, edge_list)
        assert a == b
        parts = {}
        for n, c in a.items():
            parts.setdefault(c, set()).add(int(n))
        q = nxc.modularity(g, list(parts.values()))
        singles = nxc.modularity(g, [{n} for n in g.nodes()])
        assert q > singles
        assert q > 0.15  # a real community structure, not a no-op

    def test_move_rounds_match_oracle_level1(self, spark):
        """louvain_move_rounds == the oracle's level-1 move phase."""
        from grandiso_networkx_spark.operators.community import (
            louvain_move_rounds,
            louvain_oracle,
        )

        g = nx.gnp_random_graph(25, 0.2, seed=7)
        edge_list = [(str(u), str(v)) for u, v in g.edges()]
        edges = spark.createDataFrame(edge_list, "src string, dst string")
        got = {
            r.id: r.label
            for r in louvain_move_rounds(edges, rounds=3).collect()
        }
        # replicate: single level, 3 rounds, no contraction/canon
        want_map = louvain_oracle(edge_list, max_levels=1, max_rounds=3)
        # oracle canonicalizes to min member id; move_rounds returns the
        # raw labels — compare the induced partitions instead
        def parts(d):
            out = {}
            for k, v in d.items():
                out.setdefault(v, set()).add(k)
            return sorted(map(sorted, out.values()))

        assert parts(got) == parts(want_map)


class TestPartitionAgreement:
    def _df(self, spark, mapping):
        return spark.createDataFrame(
            [(str(k), str(v)) for k, v in mapping.items()],
            "id string, label string",
        )

    @staticmethod
    def _ref(m1, m2):
        import math
        from collections import Counter

        ids = sorted(set(m1) & set(m2))
        n = len(ids)
        cont = Counter((m1[i], m2[i]) for i in ids)
        a = Counter()
        b = Counter()
        for (x, y), c in cont.items():
            a[x] += c
            b[y] += c
        c2 = lambda c: c * (c - 1) / 2.0
        sum_comb = sum(c2(c) for c in cont.values())
        sum_a = sum(c2(c) for c in a.values())
        sum_b = sum(c2(c) for c in b.values())
        exp = sum_a * sum_b / c2(n)
        maxi = (sum_a + sum_b) / 2.0
        ari = 1.0 if maxi == exp else (sum_comb - exp) / (maxi - exp)
        mi = sum(
            (c / n) * math.log(n * c / (a[x] * b[y]))
            for (x, y), c in cont.items()
        )
        h1 = -sum((c / n) * math.log(c / n) for c in a.values())
        h2 = -sum((c / n) * math.log(c / n) for c in b.values())
        denom = (h1 + h2) / 2.0
        nmi = 1.0 if denom == 0 else mi / denom
        return n, ari, nmi

    def test_identical_partitions_are_perfect(self, spark):
        m = {i: i % 3 for i in range(12)}
        row = partition_agreement(
            self._df(spark, m), self._df(spark, m)
        ).collect()[0]
        assert row.n == 12 and row.ari == 1.0 and row.nmi == 1.0

    def test_single_cluster_degenerate(self, spark):
        m = {i: "x" for i in range(8)}
        row = partition_agreement(
            self._df(spark, m), self._df(spark, m)
        ).collect()[0]
        assert row.ari == 1.0 and row.nmi == 1.0

    def test_matches_python_reference(self, spark):
        import random

        rng = random.Random(7)
        m1 = {i: rng.randrange(4) for i in range(60)}
        m2 = {i: rng.randrange(5) for i in range(60)}
        row = partition_agreement(
            self._df(spark, m1), self._df(spark, m2)
        ).collect()[0]
        n, ari, nmi = self._ref(
            {str(k): str(v) for k, v in m1.items()},
            {str(k): str(v) for k, v in m2.items()},
        )
        assert row.n == n
        assert row.ari == pytest.approx(ari, abs=1e-6)
        assert row.nmi == pytest.approx(nmi, abs=1e-6)

    def test_common_support_only(self, spark):
        m1 = {0: "a", 1: "a", 2: "b"}
        m2 = {1: "x", 2: "y", 3: "z"}
        row = partition_agreement(
            self._df(spark, m1), self._df(spark, m2)
        ).collect()[0]
        assert row.n == 2


class TestLocalCommunity:
    def test_two_cliques_sweep_finds_seed_clique(self, spark):
        from grandiso_networkx_spark.operators.community import local_community

        g = nx.Graph()
        g.add_edges_from(nx.complete_graph(range(0, 5)).edges())
        g.add_edges_from(nx.complete_graph(range(10, 15)).edges())
        g.add_edge(4, 10)
        df = spark.createDataFrame(
            [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
        )
        seeds = spark.createDataFrame([("0",)], "id string")
        rows = local_community(df, seeds, fixed_iterations=8).collect()
        members = {r.id for r in rows}
        assert members == {"0", "1", "2", "3", "4"}
        # conductance of the K5 side: cut=1, vol=21 -> 1/21
        assert rows[0].conductance == round(1 / 21, 6)

    def test_matches_python_replay(self, spark):
        from grandiso_networkx_spark.operators.community import local_community
        from grandiso_networkx_spark.operators.ppr import personalized_pagerank

        g = nx.fast_gnp_random_graph(22, 0.15, seed=10)
        g.remove_nodes_from(list(nx.isolates(g)))
        df = spark.createDataFrame(
            [(str(u), str(v)) for u, v in g.edges()], "src string, dst string"
        )
        seed = sorted(str(v) for v in g)[0]
        seeds = spark.createDataFrame([(seed,)], "id string")
        got = {(r.id, r.pos) for r in local_community(df, seeds).collect()}

        # replay the pinned rule from the engine's own PPR scores
        # over the symmetrized graph (the op's walk contract)
        sym = df.unionAll(df.selectExpr("dst as src", "src as dst")).distinct()
        p = {
            r.id: r.rank
            for r in personalized_pagerank(
                sym, seeds, fixed_iterations=6
            ).collect()
        }
        deg = {str(v): g.degree(v) for v in g}
        order = sorted(
            (v for v in p if v in deg),
            key=lambda v: (-(p[v] / deg[v]), v),
        )
        total = 2 * g.number_of_edges()
        best = None
        S = set()
        vol = 0
        internal = 0
        for k, v in enumerate(order, start=1):
            vol += deg[v]
            internal += sum(1 for u in g[_orig2(g, v)] if str(u) in S)
            S.add(v)
            cut = vol - 2 * internal
            denom = min(vol, total - vol)
            if denom <= 0:
                continue
            phi = cut / denom
            if best is None or phi < best[0]:
                best = (phi, k)
        want = {(v, i + 1) for i, v in enumerate(order[: best[1]])}
        assert got == want


def _orig2(g, sid):
    return next(v for v in g if str(v) == sid)
