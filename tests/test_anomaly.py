"""Robust median/MAD outlier scores vs a numpy oracle; degenerate-MAD
and threshold behavior."""

import numpy as np

from grandiso_networkx_spark.operators.anomaly import robust_outliers


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


class TestRobustOutliers:
    def test_vs_numpy_oracle(self, spark):
        rng = np.random.default_rng(8)
        rows = []
        i = 0
        for grp in ("a", "b"):
            for v in rng.normal(100 if grp == "a" else -5, 10, size=41):
                rows.append((i, grp, float(v)))
                i += 1
        # plant two gross outliers
        rows.append((i, "a", 10_000.0))
        rows.append((i + 1, "b", -10_000.0))
        got = {
            r.id: (r.robust_z, r.is_outlier)
            for r in robust_outliers(_df(spark, rows)).collect()
        }
        byg = {}
        for eid, g, v in rows:
            byg.setdefault(g, []).append((eid, v))
        for g, pairs in byg.items():
            vals = np.array([v for _, v in pairs])
            med = np.median(vals)
            mad = np.median(np.abs(vals - med))
            for eid, v in pairs:
                z = 0.6745 * (v - med) / mad
                assert abs(got[eid][0] - z) < 1e-9, eid
                assert got[eid][1] == (abs(z) > 3.5), eid
        assert got[i][1] and got[i + 1][1]

    def test_zero_mad_null_not_flagged(self, spark):
        rows = [(j, "c", 5.0) for j in range(9)] + [(9, "c", 99.0)]
        got = {
            r.id: (r.robust_z, r.is_outlier)
            for r in robust_outliers(_df(spark, rows)).collect()
        }
        # median 5, MAD 0 -> every score null, nothing flagged
        assert all(z is None and not f for z, f in got.values())

    def test_null_values_dropped(self, spark):
        rows = [(0, "d", 1.0), (1, "d", None), (2, "d", 3.0)]
        got = robust_outliers(_df(spark, rows)).collect()
        assert {r.id for r in got} == {0, 2}
