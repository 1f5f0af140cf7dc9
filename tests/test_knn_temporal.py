"""Mutual-kNN similarity graph and temporal motif counts."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from grandiso_networkx_spark.operators.similarity import mutual_knn_graph
from grandiso_networkx_spark.operators.temporal import temporal_motif_counts


def _np_mutual_knn(vecs, k):
    n = len(vecs)
    v = np.asarray(vecs, dtype=np.float64)
    norm = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = norm @ norm.T
    topk = {}
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i), key=lambda j: (-cos[i, j], j)
        )
        topk[i] = set(order[:k])
    return {
        (i, j): cos[i, j]
        for i, j in itertools.combinations(range(n), 2)
        if j in topk[i] and i in topk[j]
    }


class TestMutualKnn:
    def test_vs_numpy(self, spark):
        rng = np.random.RandomState(3)
        vecs = rng.randn(30, 8).astype(np.float32)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(30)],
            "vec_id long, embedding array<float>",
        )
        want = _np_mutual_knn(vecs, k=4)
        got = {
            (r.src, r.dst): r.cosine for r in mutual_knn_graph(emb, k=4).collect()
        }
        assert set(got) == set(want)
        for key in want:
            assert got[key] == pytest.approx(want[key], abs=1e-5)

    def test_mutuality_prunes_hub(self, spark):
        # 0 is near the cluster {1,2,3}; 4 is far away: with k=1, 4 lists
        # its nearest (some cluster member) but nothing lists 4 back.
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [0.9, 0.1]),
                (2, [0.8, 0.2]),
                (3, [0.95, 0.05]),
                (4, [-1.0, 0.5]),
            ],
            "vec_id long, embedding array<float>",
        )
        edges = mutual_knn_graph(emb, k=1)
        ids = {x for r in edges.collect() for x in (r.src, r.dst)}
        assert 4 not in ids


class TestTemporalMotifs:
    def _count_brute(self, edges, delta):
        two = 0
        tri = 0
        for (u, v, t1) in edges:
            for (v2, w, t2) in edges:
                if v2 == v and t1 < t2 <= t1 + delta and w != u:
                    two += 1
                    for (w3, u3, t3) in edges:
                        if (
                            w3 == w
                            and u3 == u
                            and t2 < t3 <= t1 + delta
                        ):
                            tri += 1
        return two, tri

    @pytest.mark.parametrize("seed", [0, 1])
    def test_vs_brute_force(self, spark, seed):
        rng = np.random.RandomState(seed)
        edges = [
            (int(rng.randint(5)), int(rng.randint(5)), float(rng.randint(50)))
            for _ in range(60)
        ]
        edges = [(u, v, t) for u, v, t in edges if u != v]
        df = spark.createDataFrame(edges, "src long, dst long, ts double")
        want_two, want_tri = self._count_brute(edges, delta=10.0)
        got = {
            r.motif: r.n
            for r in temporal_motif_counts(df, delta=10.0).collect()
        }
        assert got["2path"] == want_two
        assert got["triangle"] == want_tri

    def test_delta_bound_and_order(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 0.0), (2, 3, 5.0), (3, 1, 9.0)],
            "src long, dst long, ts double",
        )
        got = {r.motif: r.n for r in temporal_motif_counts(df, 10.0).collect()}
        # 1->2->3 within delta; 2->3->1 within delta; triangle closes at 9<=10
        assert got == {"2path": 2, "triangle": 1}
        # delta=5 admits both hops (inclusive bound); triangle needs 9<=5
        tight = {r.motif: r.n for r in temporal_motif_counts(df, 5.0).collect()}
        assert tight == {"2path": 2, "triangle": 0}
        # delta=4 only admits the 2->3->1 hop (gap 4)
        tighter = {r.motif: r.n for r in temporal_motif_counts(df, 4.0).collect()}
        assert tighter == {"2path": 1, "triangle": 0}

    def test_parallel_edge_events_count_separately(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 0.0), (1, 2, 1.0), (2, 3, 2.0)],
            "src long, dst long, ts double",
        )
        got = {r.motif: r.n for r in temporal_motif_counts(df, 10.0).collect()}
        assert got["2path"] == 2
