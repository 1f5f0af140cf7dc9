"""Ordered funnel analysis: for each user, the earliest time each
successive step of an event-type sequence was completed (step i must
occur at-or-after the completed step i−1) — the conversion-funnel
query of event analytics, and the transcript-domain question "did
this conversation reach error → retry → success in order".

Semantics: ``t_0(u) = min ts of step-0 events of u``;
``t_i(u) = min ts of step-i events with ts >= t_{i-1}(u)`` (ties
allowed at equal ts — at-or-after; a single event CAN satisfy two
adjacent identical steps).  ``horizon`` bounds the whole funnel:
steps after ``t_0 + horizon`` don't count.  Users missing a step have
null for it and all later steps.

Scale shape: one filtered scan of the event log (only funnel-step
types survive the pushed-down filter), then per step ONE conditional
aggregation ``min(when(type=s_i and ts >= prev)) over groupBy(user)``
— k steps = k map-side-combined aggregations over the (tiny compared
to the log) filtered frame, carried as a single per-user state row.
Value-checked by the driver against a chained-CTE DuckDB replay
(``event_funnel``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon: int | None = None,
) -> DataFrame:
    """``(user, t0, t1, …, t{k-1})`` — earliest ordered completion
    times (``ts`` numeric); one row per user having at least step 0."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).cast("long").alias("ts"),
    ).where(F.col(type_col).isin(list(set(steps))))

    state = (
        ev.where(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t0"))
    )
    for i, s in enumerate(steps[1:], start=1):
        cond = (F.col("etype") == s) & (F.col("ts") >= F.col(f"t{i-1}"))
        if horizon is not None:
            cond = cond & (F.col("ts") <= F.col("t0") + horizon)
        nxt = (
            ev.join(state, "user")
            .groupBy("user")
            .agg(F.min(F.when(cond, F.col("ts"))).alias(f"t{i}"))
        )
        state = state.join(nxt, "user", "left")
    return state
