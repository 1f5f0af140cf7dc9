"""Multi-resolution rollup: every level equals a direct aggregation of
the raw rows (losslessness of the re-aggregation), decimal-exact
totals, divisibility validation."""

import random
from decimal import Decimal

import pytest

from grandiso_networkx_spark.operators.hypertable import hypertable_rollup


def _df(spark, rows):
    return spark.createDataFrame(rows, "ts long, value double")


def _direct(rows, r):
    agg = {}
    for t, v in rows:
        b = (t // r) * r
        a = agg.setdefault(b, [0, Decimal(0), None, None])
        a[0] += 1
        a[1] += Decimal(str(v))
        a[2] = v if a[2] is None else min(a[2], v)
        a[3] = v if a[3] is None else max(a[3], v)
    return agg


class TestHypertableRollup:
    def test_levels_match_direct_aggregation(self, spark):
        rng = random.Random(55)
        rows = [
            (rng.randint(0, 10_000), round(rng.uniform(-50, 50), 2))
            for _ in range(300)
        ]
        res = [10, 100, 1000]
        out = hypertable_rollup(
            _df(spark, rows), resolutions=res
        ).collect()
        by_lvl: dict[int, dict] = {}
        for r in out:
            by_lvl.setdefault(r.resolution, {})[r.bucket_start] = r
        assert set(by_lvl) == set(res)
        for r in res:
            want = _direct(rows, r)
            got = by_lvl[r]
            assert set(got) == set(want)
            for b, (n, tot, mn, mx) in want.items():
                g = got[b]
                assert g.n_rows == n
                assert Decimal(g.total) == tot.quantize(Decimal("0.000001"))
                assert g.vmin == mn and g.vmax == mx

    def test_nonaligned_resolutions_raise(self, spark):
        with pytest.raises(ValueError):
            hypertable_rollup(_df(spark, [(0, 1.0)]), resolutions=[10, 25])

    def test_negative_timestamps_floor(self, spark):
        # floor division buckets negatives correctly (-5 // 10 -> -10)
        rows = [(-5, 1.0), (5, 2.0)]
        out = {
            (r.resolution, r.bucket_start): r.n_rows
            for r in hypertable_rollup(
                _df(spark, rows), resolutions=[10]
            ).collect()
        }
        assert out == {(10, -10): 1, (10, 0): 1}
