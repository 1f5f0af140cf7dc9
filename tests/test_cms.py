"""Count-min sketch: grid bit-for-bit vs a python replay of the md5
cell arithmetic; one-sided error (never undercounts); heavy hitters
contain every true heavy key."""

import hashlib
import random
from collections import Counter

from grandiso_networkx_spark.operators.cms import (
    cms_build,
    cms_heavy_hitters,
    cms_query,
)

SEED, D, W = 42, 4, 64


def _cell(key: str, r: int) -> int:
    h = int(
        hashlib.md5(f"{key}|{r}|{SEED}".encode()).hexdigest()[:15], 16
    )
    return h % W


def _grid_oracle(keys):
    grid = Counter()
    for k in keys:
        for r in range(D):
            grid[(r, _cell(k, r))] += 1
    return dict(grid)


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


class TestCMS:
    def test_grid_bit_for_bit(self, spark):
        rng = random.Random(66)
        keys = [f"k{rng.randint(0, 50)}" for _ in range(400)]
        got = {
            (r.r, r.c): r.n
            for r in cms_build(_df(spark, keys), depth=D, width=W).collect()
        }
        assert got == _grid_oracle(keys)

    def test_never_undercounts_and_bounded(self, spark):
        rng = random.Random(9)
        keys = [f"k{rng.randint(0, 200)}" for _ in range(600)]
        true = Counter(keys)
        df = _df(spark, keys)
        sketch = cms_build(df, depth=D, width=W)
        est = {
            r.key: r.est
            for r in cms_query(sketch, df, depth=D, width=W).collect()
        }
        n = len(keys)
        for k, c in true.items():
            assert est[k] >= c, k
            # generous epsilon bound: e/W * N  (~2.7/64 * 600)
            assert est[k] <= c + (2.72 / W) * n * 4, k

    def test_heavy_hitters_complete(self, spark):
        keys = ["hot"] * 300 + [f"cold{i}" for i in range(200)]
        hh = {
            r.key
            for r in cms_heavy_hitters(
                _df(spark, keys), min_share=0.5, depth=D, width=W
            ).collect()
        }
        assert "hot" in hh
        # one-sided: nothing with true share >= 0.5 may be missing;
        # with 500 rows only 'hot' qualifies truly, and collisions can
        # only ADD keys near the threshold, not remove 'hot'
