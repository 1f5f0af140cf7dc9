"""As-of (temporal) join: for every left row, the most recent right
row at-or-before its timestamp, per key — the standard point-in-time
enrichment (match an event to the feature snapshot / session start /
price that was current when it happened).

Spark has no ASOF JOIN operator (the task-rubric example of a custom
operator); the naive formulation is a per-key range join
(``l.key = r.key AND r.ts <= l.ts`` + argmax), which Catalyst executes
as a broadcast-nested-loop or a key-join with per-key Θ(|L|·|R|)
filtering — quadratic in hot keys.  This implements the scalable
**union-sort-carry** formulation instead:

1. tag both inputs and UNION them into one frame;
2. ONE shuffle on the key, sort within partition by
   ``(ts, side)`` (right rows first on ties → at-or-before
   semantics);
3. a ``last(value, ignorenulls) OVER (... ROWS UNBOUNDED PRECEDING)``
   window carries the latest right payload forward onto every left
   row.

Total cost: one shuffle + one sort of |L|+|R| rows, linear per key —
the same discipline a time-series store's ASOF uses.  An optional
``tolerance`` bounds staleness (matches older than it become null,
exactly DuckDB/pandas ``merge_asof`` semantics).  Value-checked by
the driver against DuckDB's native ``ASOF LEFT JOIN``
(``event_asof_session``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of left join.

    Returns every ``left`` row plus, for each non-key non-ts ``right``
    column ``c``, a ``c{suffix}`` column holding the value from the
    most recent right row with ``right_ts <= left_ts`` for the same
    ``on`` key (null when none exists), plus ``{right_ts}{suffix}``
    (the matched row's timestamp).  ``tolerance`` (same units as the
    timestamp column, which must be numeric/castable to long) nulls
    matches older than ``left_ts - tolerance``.

    Ties: a right row at exactly ``left_ts`` matches (at-or-before).
    Multiple right rows on the same ``(key, ts)``: the carry takes the
    last under the engine's sort — make ``right_ts`` unique per key
    (e.g. pre-aggregate) for fully deterministic payloads.
    """
    payload_cols = [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # Output-name collision guard (mirrors interval_join): produced
    # `{c}{suffix}` columns and the internal temporaries must not
    # already exist on the left frame, else the result would silently
    # carry duplicate/ambiguous names.
    produced = {f"{c}{suffix}" for c in payload_cols} | {f"{right_ts}{suffix}"}
    internal = {"__k", "__ts", "__side", "__r", "__m"}
    clash = (produced | internal) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output columns {sorted(clash)} collide with "
            "left columns — pass a different suffix or rename"
        )
    # left rows keep their original columns; right rows contribute ONE
    # atomic payload struct (carrying columns independently could mix
    # values from different right rows when payloads contain nulls)
    l_tag = left.select(
        "*",
        F.col(on).alias("__k"),
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c) for c in payload_cols],
            F.col(right_ts).alias(right_ts),
        ).alias("__r"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag, allowMissingColumns=True)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__m",
            F.when(
                F.col("__ts")
                - F.col(f"__m.{right_ts}").cast("long")
                <= F.lit(tolerance),
                F.col("__m"),
            ),
        )
    return carried.select(
        *left.columns,
        *[
            F.col(f"__m.{c}").alias(f"{c}{suffix}")
            for c in payload_cols
        ],
        F.col(f"__m.{right_ts}").alias(f"{right_ts}{suffix}"),
    )
