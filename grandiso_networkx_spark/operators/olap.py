"""OLAP aggregates over the event log: rollup subtotals, running-total
windows, ranked top-k per group.

The reference has no aggregation surface at all (SURVEY §2.5 — "no
grouping sets/cube/rollup anywhere"); these cover the standard
relational checklist the task rubric lists, expressed declaratively so
Catalyst plans them (rollup = one Expand + partial/final hash
aggregate; windows = one shuffle on the partition key; top-k per group
= rank window + filter, never a global sort).

All three are plain-SQL-expressible and value-checked by the driver
(``event_rollup``, ``user_running_totals``, ``top_transitions``).
Null group keys from ROLLUP subtotals are coalesced to explicit
sentinels ('(all)' / -1) so cross-engine hashing is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def event_rollup(events: DataFrame) -> DataFrame:
    """``(event_type, hour, n_events, total_value)`` with ROLLUP
    subtotals: per (type, hour-of-day), per type, and grand total —
    subtotal keys read '(all)' / -1."""
    base = events.select(
        "event_type",
        F.hour("ts").cast("int").alias("hour"),
        "value",
    )
    return (
        base.rollup("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            # grouping() is only legal inside the aggregate — carry the
            # bits out so the sentinel applies ONLY to subtotal rows
            # (a genuinely-NULL data value stays NULL and can never
            # collide with the rollup sentinels)
            F.grouping("event_type").alias("__g1"),
            F.grouping("hour").alias("__g2"),
        )
        .select(
            F.when(F.col("__g1") == 1, F.lit("(all)"))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("__g2") == 1, F.lit(-1))
            .otherwise(F.col("hour"))
            .alias("hour"),
            "n_events",
            "total_value",
        )
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """``(user_id, event_id, seq, run_value)`` — per-user event
    sequence number and running value total under the engine's stable
    ``(ts, event_id)`` ordering (the transcript-derivation ordering
    contract).  One shuffle on ``user_id``; the frame is
    rows-unbounded-preceding, evaluated streamingly per partition."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("seq"),
        F.round(
            F.sum("value").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            6,
        ).alias("run_value"),
    )


def top_transitions_per_user(
    events: DataFrame, k: int = 2
) -> DataFrame:
    """``(user_id, src, dst, n, rnk)`` — each user's ``k`` most
    frequent event-type transitions (deterministic tie-break by
    (count desc, src, dst)); rank window + filter, no global sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("user_id", "src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rw = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), "src", "dst"
    )
    return trans.select(
        "user_id", "src", "dst", "n", F.row_number().over(rw).alias("rnk")
    ).where(F.col("rnk") <= k)


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Cohort retention triangle: ``(cohort_start, period, n_users)``
    — users grouped by the time bucket of their FIRST event, counted
    distinct in every later bucket they returned in (``period`` =
    buckets since cohort start; period 0 is the cohort size).

    ``ts_col`` numeric (e.g. unix micros), ``bucket`` the cohort/
    activity granularity in the same units.  Scale shape: one
    ``groupBy(user).min`` for cohort assignment, one broadcast-or-
    shuffled user-keyed join back, one distinct-count aggregate — no
    self-join over the event log."""
    ts = F.col(ts_col).cast("long")
    firsts = (
        events.select(F.col(user_col).alias("u"), ts.alias("__ts"))
        .groupBy("u")
        .agg(F.min("__ts").alias("first_ts"))
        .select(
            "u",
            (F.floor(F.col("first_ts") / bucket) * bucket)
            .cast("long")
            .alias("cohort_start"),
        )
    )
    return (
        events.select(F.col(user_col).alias("u"), ts.alias("__ts"))
        .join(firsts, "u")
        .select(
            "cohort_start",
            (
                F.floor(F.col("__ts") / bucket)
                - F.col("cohort_start") / bucket
            )
            .cast("long")
            .alias("period"),
            "u",
        )
        .groupBy("cohort_start", "period")
        .agg(F.count_distinct("u").alias("n_users"))
    )


def user_activity_features(events: DataFrame) -> DataFrame:
    """Per-user event-sequence profile ``(user_id, n_events, n_types,
    span_sec, mean_gap_sec, top_type)`` — the session/conversation
    feature table a dialogue-data curation pass filters on (activity
    volume, diversity, pacing, dominant action).

    - ``span_sec``    — last minus first event time, seconds;
    - ``mean_gap_sec``— ``span / (n_events - 1)`` (NULL for a single
      event) — the average inter-event gap without materializing the
      per-gap stream;
    - ``top_type``    — most frequent event type, ties broken by the
      lexicographically smallest (the engine's standard rule).

    Scale shape: ONE ``groupBy(user_id)`` over the event scan plus a
    ``groupBy(user_id, event_type)`` + per-user top-1 window for the
    mode — both map-side combined; timestamps reduce via integer
    epoch-micros so any SQL replay is bit-identical.
    """
    ts_type = dict(events.dtypes).get("ts")
    if ts_type == "timestamp_ntz":
        # micros since epoch, timezone-free — matches DuckDB epoch_us
        # on the same wall-clock value (the parquet tables are NTZ)
        epoch = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    else:
        epoch = F.unix_micros(F.col("ts"))
    base = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min(epoch).alias("__t0"),
        F.max(epoch).alias("__t1"),
    )
    span = (F.col("__t1") - F.col("__t0")) / F.lit(1_000_000.0)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("__n"), F.asc("event_type")
    )
    top = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    return base.join(top, "user_id").select(
        "user_id",
        "n_events",
        "n_types",
        F.round(span, 6).alias("span_sec"),
        F.round(
            F.when(
                F.col("n_events") > 1, span / (F.col("n_events") - 1)
            ),
            6,
        ).alias("mean_gap_sec"),
        "top_type",
    )
