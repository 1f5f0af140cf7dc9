"""Weighted first-order walks: corpus equality bit-for-bit vs a pure
python replay of the md5 draw + cumulative inversion; bias sanity;
input validation."""

import hashlib
import random

import pytest

from grandiso_networkx_spark.operators.walks import weighted_random_walks

SEED = 42


def _draw(start, rep, step, seed=SEED):
    h = int(
        hashlib.md5(f"{start}|{rep}|{step}|{seed}".encode()).hexdigest()[:15],
        16,
    )
    return h / float(1 << 60)


def _oracle(weighted_edges, length, reps, seed=SEED):
    adj: dict[str, list[tuple[str, float]]] = {}
    agg: dict[tuple[str, str], float] = {}
    for u, v, w in weighted_edges:
        if u != v:
            agg[(u, v)] = agg.get((u, v), 0.0) + w
    for (u, v), w in agg.items():
        adj.setdefault(u, []).append((v, w))
    for u in adj:
        adj[u].sort()
    rows = set()
    for start in adj:
        for rep in range(reps):
            cur = start
            rows.add((start, rep, 0, cur))
            for step in range(1, length + 1):
                if cur not in adj:
                    break
                nbrs = adj[cur]
                ws = [w for _, w in nbrs]
                tot = 0.0
                for w in ws:
                    tot += w
                target = _draw(start, rep, step, seed) * tot
                cum, sel = 0.0, 0
                for i, w in enumerate(ws, 1):
                    cum += w
                    if sel == 0 and cum > target:
                        sel = i
                idx = sel if sel else len(ws)
                cur = nbrs[idx - 1][0]
                rows.add((start, rep, step, cur))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight double")


class TestWeightedWalks:
    def test_bit_for_bit(self, spark):
        rng = random.Random(31)
        nodes = [f"n{i}" for i in range(15)]
        rows = [
            (rng.choice(nodes), rng.choice(nodes), float(rng.randint(1, 9)))
            for _ in range(60)
        ]
        rows = [r for r in rows if r[0] != r[1]]
        got = {
            (r.start, r.rep, r.step, r.vertex)
            for r in weighted_random_walks(
                _df(spark, rows), walk_length=4, walks_per_vertex=2
            ).collect()
        }
        assert got == _oracle(rows, 4, 2)

    def test_multi_edge_weights_sum(self, spark):
        rows = [("a", "b", 1.0), ("a", "b", 2.0), ("a", "c", 1.0)]
        got = {
            (r.start, r.rep, r.step, r.vertex)
            for r in weighted_random_walks(
                _df(spark, rows), walk_length=1, walks_per_vertex=4
            ).collect()
        }
        assert got == _oracle(rows, 1, 4)

    def test_bias_toward_heavy_edge(self, spark):
        # a -> b weight 99, a -> c weight 1: b picked overwhelmingly
        rows = [("a", "b", 99.0), ("a", "c", 1.0)]
        out = weighted_random_walks(
            _df(spark, rows), walk_length=1, walks_per_vertex=50
        )
        picks = [
            r.vertex for r in out.collect() if r.step == 1 and r.start == "a"
        ]
        assert picks.count("b") >= 45

    def test_nonpositive_weight_raises(self, spark):
        rows = [("a", "b", 0.0)]
        with pytest.raises(ValueError):
            weighted_random_walks(_df(spark, rows))
