"""Funnel completion times vs a python oracle; ordering, horizon, and
missing-step semantics."""

import random

from grandiso_networkx_spark.operators.funnel import funnel


def _oracle(rows, steps, horizon=None):
    by_user: dict[int, list[tuple[str, int]]] = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((t, ts))
    out = {}
    for u, evs in by_user.items():
        t0c = [ts for t, ts in evs if t == steps[0]]
        if not t0c:
            continue
        times = [min(t0c)]
        for s in steps[1:]:
            prev = times[-1]
            if prev is None:
                times.append(None)
                continue
            cands = [
                ts
                for t, ts in evs
                if t == s
                and ts >= prev
                and (horizon is None or ts <= times[0] + horizon)
            ]
            times.append(min(cands) if cands else None)
        out[u] = tuple(times)
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts long"
    )


class TestFunnel:
    def test_vs_oracle_random(self, spark):
        rng = random.Random(3)
        types = ["signup", "view", "purchase", "other"]
        rows = [
            (rng.randint(0, 9), rng.choice(types), rng.randint(0, 300))
            for _ in range(250)
        ]
        steps = ["signup", "view", "purchase"]
        got = {
            r.user: (r.t0, r.t1, r.t2)
            for r in funnel(_df(spark, rows), steps).collect()
        }
        assert got == _oracle(rows, steps)

    def test_order_matters(self, spark):
        # purchase BEFORE signup does not count
        rows = [(1, "purchase", 5), (1, "signup", 10)]
        (r,) = funnel(_df(spark, rows), ["signup", "purchase"]).collect()
        assert r.t0 == 10 and r.t1 is None

    def test_horizon(self, spark):
        rows = [(1, "signup", 0), (1, "purchase", 50), (2, "signup", 0), (2, "purchase", 500)]
        got = {
            r.user: r.t1
            for r in funnel(
                _df(spark, rows), ["signup", "purchase"], horizon=100
            ).collect()
        }
        assert got == {1: 50, 2: None}

    def test_missing_first_step_excluded(self, spark):
        rows = [(1, "purchase", 5)]
        assert funnel(_df(spark, rows), ["signup", "purchase"]).count() == 0
