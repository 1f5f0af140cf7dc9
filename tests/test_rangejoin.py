"""Bin-bucketed interval join vs a brute-force python range join:
multiplicity, half-open bounds, bin-boundary straddling, left mode."""

import random

from grandiso_networkx_spark.operators.rangejoin import interval_join


def _brute(events, intervals):
    out = []
    for e in events:
        for iv in intervals:
            if e[0] == iv[0] and iv[1] <= e[1] < iv[2]:
                out.append((*e, iv[1], iv[2], iv[3]))
    return sorted(out)


def _dfs(spark, events, intervals):
    ev = spark.createDataFrame(events, "uid long, ts long, ev string")
    iv = spark.createDataFrame(
        intervals, "uid long, start long, end long, label string"
    )
    return ev, iv


class TestIntervalJoin:
    def test_vs_brute_force_random(self, spark):
        rng = random.Random(77)
        events = [
            (rng.randint(0, 4), rng.randint(0, 500), f"e{i}")
            for i in range(120)
        ]
        intervals = []
        for j in range(40):
            s = rng.randint(0, 480)
            intervals.append(
                (rng.randint(0, 4), s, s + rng.randint(1, 90), f"iv{j}")
            )
        ev, iv = _dfs(spark, events, intervals)
        # bin width smaller than many intervals: exercises multi-bin
        # explode + exactly-once pairing
        got = sorted(
            (r.uid, r.ts, r.ev, r.start, r.end, r.label)
            for r in interval_join(ev, iv, on="uid", bin_width=32).collect()
        )
        assert got == _brute(events, intervals)

    def test_half_open_bounds(self, spark):
        ev, iv = _dfs(
            spark,
            [(1, 10, "at_start"), (1, 20, "at_end")],
            [(1, 10, 20, "w")],
        )
        got = {r.ev for r in interval_join(ev, iv, on="uid", bin_width=7).collect()}
        assert got == {"at_start"}

    def test_overlapping_intervals_multiplicity(self, spark):
        ev, iv = _dfs(
            spark,
            [(1, 15, "e")],
            [(1, 10, 20, "a"), (1, 0, 100, "b")],
        )
        got = sorted(
            r.label
            for r in interval_join(ev, iv, on="uid", bin_width=8).collect()
        )
        assert got == ["a", "b"]

    def test_left_mode_null_padding(self, spark):
        ev, iv = _dfs(
            spark,
            [(1, 15, "hit"), (2, 15, "miss")],
            [(1, 10, 20, "a")],
        )
        got = {
            r.ev: r.label
            for r in interval_join(
                ev, iv, on="uid", bin_width=16, how="left"
            ).collect()
        }
        assert got == {"hit": "a", "miss": None}

    def test_left_mode_null_event_column_not_duplicated(self, spark):
        # a matched event carrying a NULL payload column must not come
        # back a second time as a spurious null-padded "unmatched" row
        ev = spark.createDataFrame(
            [(1, 15, None), (2, 15, "m")], "uid long, ts long, ev string"
        )
        iv = spark.createDataFrame(
            [(1, 10, 20, "a")],
            "uid long, start long, end long, label string",
        )
        rows = interval_join(
            ev, iv, on="uid", bin_width=16, how="left"
        ).collect()
        by_uid = {}
        for r in rows:
            by_uid.setdefault(r.uid, []).append(r.label)
        assert by_uid == {1: ["a"], 2: [None]}

    def test_suffix_and_collision_guard(self, spark):
        import pytest

        ev = spark.createDataFrame(
            [(1, 15, "e")], "uid long, ts long, label string"
        )
        iv = spark.createDataFrame(
            [(1, 10, 20, "a")],
            "uid long, start long, end long, label string",
        )
        # colliding 'label' without a suffix: refuse up front
        with pytest.raises(ValueError):
            interval_join(ev, iv, on="uid", bin_width=16)
        (row,) = interval_join(
            ev, iv, on="uid", bin_width=16, suffix="_iv"
        ).collect()
        assert row.label == "e" and row.label_iv == "a"
