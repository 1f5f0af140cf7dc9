"""As-of join vs pandas merge_asof (backward, by-key, with and without
tolerance); tie and no-match semantics."""

import pandas as pd

from grandiso_networkx_spark.operators.asof import asof_join


def _dfs(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, "uid long, ts long, ev string")
    right = spark.createDataFrame(rrows, "uid long, ts long, snap string")
    return left, right


class TestAsofJoin:
    def test_vs_pandas_merge_asof(self, spark):
        import random

        rng = random.Random(44)
        lrows = [
            (u, rng.randint(0, 1000), f"e{i}")
            for i, u in enumerate(rng.choices(range(6), k=80))
        ]
        rrows_raw = [
            (u, rng.randint(0, 1000), f"s{i}")
            for i, u in enumerate(rng.choices(range(6), k=40))
        ]
        # unique (uid, ts) on the right: tie payloads are unordered
        seen = set()
        rrows = []
        for u, t, s in rrows_raw:
            if (u, t) not in seen:
                seen.add((u, t))
                rrows.append((u, t, s))
        left, right = _dfs(spark, lrows, rrows)
        got = {
            (r.uid, r.ts, r.ev): (r.snap_right, r.ts_right)
            for r in asof_join(left, right, on="uid").collect()
        }
        lp = pd.DataFrame(lrows, columns=["uid", "ts", "ev"]).sort_values("ts")
        rp = pd.DataFrame(rrows, columns=["uid", "ts", "snap"]).sort_values("ts")
        m = pd.merge_asof(
            lp, rp, on="ts", by="uid", direction="backward",
            suffixes=("", "_right"),
        )
        assert len(got) == len(lrows)
        for _, row in m.iterrows():
            want_snap = None if pd.isna(row["snap"]) else row["snap"]
            k = (row["uid"], row["ts"], row["ev"])
            assert got[k][0] == want_snap, k

    def test_exact_tie_matches(self, spark):
        left, right = _dfs(
            spark, [(1, 100, "e")], [(1, 100, "s0"), (1, 99, "s1")]
        )
        (row,) = asof_join(left, right, on="uid").collect()
        assert row.snap_right == "s0" and row.ts_right == 100

    def test_no_prior_match_null(self, spark):
        left, right = _dfs(spark, [(1, 50, "e")], [(1, 60, "s")])
        (row,) = asof_join(left, right, on="uid").collect()
        assert row.snap_right is None and row.ts_right is None

    def test_tolerance(self, spark):
        left, right = _dfs(
            spark, [(1, 100, "e"), (1, 200, "f")], [(1, 90, "s")]
        )
        got = {
            r.ev: r.snap_right
            for r in asof_join(left, right, on="uid", tolerance=50).collect()
        }
        assert got == {"e": "s", "f": None}

    def test_keys_never_cross(self, spark):
        left, right = _dfs(spark, [(1, 100, "e")], [(2, 50, "s")])
        (row,) = asof_join(left, right, on="uid").collect()
        assert row.snap_right is None
