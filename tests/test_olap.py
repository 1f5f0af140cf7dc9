"""OLAP aggregates: hand-checked rollup subtotal math, running-total
windows, and deterministic top-k ranking."""

import datetime

from grandiso_networkx_spark.operators.olap import (
    event_rollup,
    top_transitions_per_user,
    user_running_totals,
)


def _events(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (0, t0, 1, "a", 1.0),
        (1, t0 + datetime.timedelta(minutes=5), 1, "b", 2.0),
        (2, t0 + datetime.timedelta(hours=1), 1, "a", 3.0),
        (3, t0, 2, "a", 4.0),
        (4, t0 + datetime.timedelta(minutes=1), 2, "a", 5.0),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    )


class TestRollup:
    def test_subtotals(self, spark):
        got = {
            (r.event_type, r.hour): (r.n_events, r.total_value)
            for r in event_rollup(_events(spark)).collect()
        }
        assert got[("a", 10)] == (3, 10.0)
        assert got[("a", 11)] == (1, 3.0)
        assert got[("b", 10)] == (1, 2.0)
        # per-type subtotal and grand total
        assert got[("a", -1)] == (4, 13.0)
        assert got[("b", -1)] == (1, 2.0)
        assert got[("(all)", -1)] == (5, 15.0)
        assert len(got) == 6


class TestRunningTotals:
    def test_sequences(self, spark):
        got = {
            (r.user_id, r.event_id): (r.seq, r.run_value)
            for r in user_running_totals(_events(spark)).collect()
        }
        assert got[(1, 0)] == (1, 1.0)
        assert got[(1, 1)] == (2, 3.0)
        assert got[(1, 2)] == (3, 6.0)
        assert got[(2, 3)] == (1, 4.0)
        assert got[(2, 4)] == (2, 9.0)


class TestTopTransitions:
    def test_rank_and_tiebreak(self, spark):
        got = [
            (r.user_id, r.src, r.dst, r.n, r.rnk)
            for r in top_transitions_per_user(_events(spark), k=2)
            .orderBy("user_id", "rnk")
            .collect()
        ]
        # user 1: a->b (1), b->a (1) tie broken lexicographically
        assert got[0] == (1, "a", "b", 1, 1)
        assert got[1] == (1, "b", "a", 1, 2)
        # user 2: single a->a transition
        assert got[2] == (2, "a", "a", 1, 1)


class TestRetentionCohorts:
    def test_triangle(self, spark):
        from grandiso_networkx_spark.operators.olap import retention_cohorts

        # bucket = 10; users: 1 starts in bucket 0 and returns in 2;
        # 2 starts in bucket 1 only; 3 starts bucket 0, active 0 and 1
        rows = [
            (0, 1, 3), (1, 1, 25),
            (2, 2, 12),
            (3, 3, 5), (4, 3, 9), (5, 3, 15),
        ]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
        got = {
            (r.cohort_start, r.period): r.n_users
            for r in retention_cohorts(df, bucket=10).collect()
        }
        assert got == {
            (0, 0): 2,   # users 1 and 3 in their cohort bucket
            (0, 1): 1,   # user 3 returned next bucket
            (0, 2): 1,   # user 1 returned two buckets later
            (10, 0): 1,  # user 2's cohort
        }


def test_user_activity_features(spark):
    import datetime as dt

    from grandiso_networkx_spark.operators.olap import user_activity_features

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, "a", t0),
        (1, "b", t0 + dt.timedelta(seconds=10)),
        (1, "a", t0 + dt.timedelta(seconds=30)),
        (2, "z", t0),
        (3, "b", t0),
        (3, "c", t0 + dt.timedelta(seconds=5)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {r.user_id: r for r in user_activity_features(ev).collect()}
    assert got[1].n_events == 3 and got[1].n_types == 2
    assert got[1].span_sec == 30.0 and got[1].mean_gap_sec == 15.0
    assert got[1].top_type == "a"  # 2 vs 1
    assert got[2].mean_gap_sec is None and got[2].span_sec == 0.0
    assert got[3].top_type == "b"  # tie 1-1 -> smallest
