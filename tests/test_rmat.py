"""R-MAT generator: edge list bit-for-bit vs a python replay of the
quadrant recursion; range/determinism/skew properties."""

import hashlib
from collections import Counter

from grandiso_networkx_spark.sources.rmat import rmat_edges

SEED = 42


def _u(i: int, level: int, seed: int = SEED) -> float:
    h = int(
        hashlib.md5(f"{i}|{level}|{seed}".encode()).hexdigest()[:15], 16
    )
    return h / float(1 << 60)


def _oracle(scale, m, a, b, c):
    out = []
    for i in range(m):
        src = dst = 0
        for level in range(scale):
            u = _u(i, level)
            sb = 0 if u < a + b else 1
            if u < a:
                db = 0
            elif u < a + b:
                db = 1
            elif u < a + b + c:
                db = 0
            else:
                db = 1
            src = src * 2 + sb
            dst = dst * 2 + db
        out.append((i, src, dst))
    return [(s, d) for _, s, d in out]


class TestRMAT:
    def test_bit_for_bit(self, spark):
        got = [
            (r.src, r.dst)
            for r in rmat_edges(spark, scale=6, n_edges=200)
            .orderBy("src", "dst")
            .collect()
        ]
        want = sorted(_oracle(6, 200, 0.57, 0.19, 0.19))
        assert got == want

    def test_range_and_determinism(self, spark):
        df = rmat_edges(spark, scale=7, n_edges=300)
        rows = df.collect()
        n = 1 << 7
        assert all(0 <= r.src < n and 0 <= r.dst < n for r in rows)
        rows2 = rmat_edges(spark, scale=7, n_edges=300).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))

    def test_skewed_degrees(self, spark):
        # default probs concentrate mass in the (0,0) quadrant: the
        # max out-degree must clearly exceed the uniform expectation
        rows = rmat_edges(spark, scale=8, n_edges=2048).collect()
        deg = Counter(r.src for r in rows)
        assert max(deg.values()) > 3 * (2048 / (1 << 8))

    def test_bad_probs_raise(self, spark):
        import pytest

        with pytest.raises(ValueError):
            rmat_edges(spark, scale=5, a=0.6, b=0.3, c=0.3)
