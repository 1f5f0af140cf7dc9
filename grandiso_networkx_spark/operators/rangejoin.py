"""Interval (range) join: match point events to keyed intervals
``start <= ts < end`` — the session-attribution / validity-window
join Spark has no native operator for (the task-rubric "range join"
example).

The naive formulation ``l.key = r.key AND ts >= start AND ts < end``
makes Catalyst pick a key-equi join with a residual range filter —
every event meets every interval of its key, Θ(|events_k| ·
|intervals_k|) per key, quadratic on hot keys.  This implements the
standard **bin-bucketing** rewrite (the same trick behind the
range-join optimizations in commercial Spark runtimes):

1. pick a ``bin_width`` (ideally ≥ the typical interval length);
2. each interval explodes into the bins it overlaps
   (``floor(start/w) .. floor((end-1)/w)`` — ≤ len/w + 1 rows);
3. each event maps to exactly ONE bin (``floor(ts/w)``);
4. equi join on ``(key, bin)`` + the exact residual filter.

Work per key collapses to events × the intervals overlapping their
bin.  Because the event side has one bin, every true (event,
interval) pair is produced exactly once — no dedup pass.  Overlapping
intervals legitimately yield multiple output rows per event (it is a
join, not a lookup).  Value-checked against a plain DuckDB range join
(``event_interval_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_width: int = 3_600_000_000,
    how: str = "inner",
    suffix: str = "",
) -> DataFrame:
    """Join point rows to ``[start, end)`` intervals per ``on`` key.

    ``ts``/``start``/``end`` must be numeric (e.g. unix micros —
    default ``bin_width`` is 1 hour in micros).  ``how`` is ``inner``
    or ``left`` (unmatched events keep nulls on the interval side).
    Returns every event column plus the interval's non-key columns,
    renamed with ``suffix``; a collision between an (un-suffixed)
    interval column and an event column raises up front — pass e.g.
    ``suffix="_iv"`` like :func:`~.asof.asof_join`'s ``_right``.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    w = int(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")
    iv_cols = [c for c in intervals.columns if c != on]
    clash = {f"{c}{suffix}" for c in iv_cols} & set(events.columns)
    if clash:
        raise ValueError(
            f"interval columns {sorted(clash)} collide with event "
            "columns — pass a suffix (e.g. suffix='_iv')"
        )
    iv = intervals.where(F.col(end) > F.col(start)).select(
        F.col(on).alias("__k"),
        F.explode(
            F.sequence(
                F.floor(F.col(start) / w).cast("long"),
                F.floor((F.col(end) - 1) / w).cast("long"),
            )
        ).alias("__bin"),
        F.struct(*[F.col(c) for c in iv_cols]).alias("__iv"),
    )
    ev = events.select(
        "*",
        F.col(on).alias("__k"),
        F.floor(F.col(ts) / w).cast("long").alias("__bin"),
    )
    residual = (F.col(ts) >= F.col(f"__iv.{start}")) & (
        F.col(ts) < F.col(f"__iv.{end}")
    )
    matched = (
        ev.join(iv, ["__k", "__bin"])
        .where(residual)
        .select(
            *events.columns,
            *[F.col(f"__iv.{c}").alias(f"{c}{suffix}") for c in iv_cols],
        )
    )
    if how == "inner":
        return matched
    # left: true join multiplicity for matches, one null-padded row for
    # events with no matching interval.  The anti join must be
    # NULL-SAFE on every event column — plain equality would let a
    # matched row carrying a NULL column "miss itself" and come back a
    # second time null-padded.
    mk = matched.select(*events.columns).distinct().alias("__mk")
    ev_l = events.alias("__ev")
    cond = None
    for c in events.columns:
        t = F.col(f"__ev.{c}").eqNullSafe(F.col(f"__mk.{c}"))
        cond = t if cond is None else cond & t
    unmatched = ev_l.join(mk, cond, "left_anti")
    return matched.unionByName(unmatched, allowMissingColumns=True)
