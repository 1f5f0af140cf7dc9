"""Neighborhood feature aggregation vs a numpy oracle."""

import numpy as np
import pytest

from grandiso_networkx_spark.operators.features import (
    feature_propagation,
    neighbor_mean_features,
)


def _setup(spark, seed=5, n=20, d=4, p=0.2):
    rnd = np.random.RandomState(seed)
    feats = {i: rnd.rand(d).round(6) for i in range(n)}
    edges = [
        (str(u), str(v))
        for u in range(n)
        for v in range(n)
        if u != v and rnd.rand() < p
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    fdf = spark.createDataFrame(
        [(str(i), [float(x) for x in v]) for i, v in feats.items()],
        "id string, vec array<double>",
    )
    return edges, feats, edf, fdf


def _want_mean(edges, feats, include_self=False):
    from collections import defaultdict

    inn = defaultdict(list)
    for u, v in edges:
        inn[v].append(np.array(feats[int(u)]))
    if include_self:
        for i, v in feats.items():
            inn[str(i)].append(np.array(v))
    return {k: np.mean(vs, axis=0) for k, vs in inn.items()}


class TestNeighborMean:
    @pytest.mark.parametrize("include_self", [False, True])
    def test_matches_numpy(self, spark, include_self):
        edges, feats, edf, fdf = _setup(spark)
        got = {
            r.id: np.array(r.vec)
            for r in neighbor_mean_features(
                edf, fdf, include_self=include_self
            ).collect()
        }
        want = _want_mean(edges, feats, include_self)
        assert set(got) == set(want)
        for k in want:
            assert np.allclose(got[k], want[k], atol=1e-12), k

    def test_positional_order_preserved(self, spark):
        # one edge, asymmetric vector: any pos scramble would show.
        edf = spark.createDataFrame([("a", "b")], "src string, dst string")
        fdf = spark.createDataFrame(
            [("a", [1.0, 2.0, 3.0, 4.0]), ("b", [0.0, 0.0, 0.0, 0.0])],
            "id string, vec array<double>",
        )
        got = neighbor_mean_features(edf, fdf).collect()
        assert len(got) == 1 and got[0].vec == [1.0, 2.0, 3.0, 4.0]


class TestPropagation:
    def test_two_rounds_matches_numpy(self, spark):
        edges, feats, edf, fdf = _setup(spark, seed=9)
        got = {
            r.id: np.array(r.vec)
            for r in feature_propagation(edf, fdf, rounds=2, alpha=0.5).collect()
        }
        x = {str(i): np.array(v, dtype=float) for i, v in feats.items()}
        for _ in range(2):
            from collections import defaultdict

            inn = defaultdict(list)
            for u, v in edges:
                inn[v].append(x[u])
            x = {
                k: (0.5 * xv + 0.5 * np.mean(inn[k], axis=0))
                if k in inn
                else xv
                for k, xv in x.items()
            }
        assert set(got) == set(x)
        for k in x:
            assert np.allclose(got[k], x[k], atol=1e-12), k

    def test_zero_rounds_identity(self, spark):
        _, feats, edf, fdf = _setup(spark)
        got = {
            r.id: r.vec for r in feature_propagation(edf, fdf, rounds=0).collect()
        }
        assert got == {str(i): list(v) for i, v in feats.items()}
        with pytest.raises(ValueError):
            feature_propagation(edf, fdf, rounds=-1)
