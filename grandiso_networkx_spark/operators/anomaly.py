"""Robust outlier scoring over the event log: per-group modified
z-scores from median/MAD (Iglewicz & Hoaglin 1993) — the data-quality
gate a pipeline runs over numeric telemetry before training on it
(mean/stddev z-scores are themselves corrupted by the outliers they
are supposed to find; median/MAD are 50%-breakdown robust).

    robust_z(x) = 0.6745 · (x − median_g) / MAD_g,
    MAD_g = median(|x − median_g|)  within group g

``|robust_z| > 3.5`` is the standard flag threshold.  Degenerate
groups (MAD = 0, i.e. >50% identical values) yield null scores and are
never flagged — the caller decides about constant-column groups.

Scale shape: two grouped EXACT ``percentile`` aggregations (each one
shuffle keyed by the group; exact percentile sorts within group —
right up to ~10⁸ rows/group, swap in ``approx_percentile`` beyond
that, same plan shape) + two broadcast-size joins of the per-group
statistics back onto the rows (#groups ≪ #rows).  Value-checked by
the driver (``event_outliers``) — Spark's exact ``percentile`` and
DuckDB's ``quantile_cont`` interpolate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MZ = 0.6745  # Phi^-1(0.75): scales MAD to sigma-equivalents


def robust_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    z_thresh: float = 3.5,
) -> DataFrame:
    """``(id, group, value, robust_z, is_outlier)`` for every row with
    a non-null value."""
    rows = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col(value_col).isNotNull())
    med = rows.groupBy("grp").agg(F.percentile("v", 0.5).alias("med"))
    with_med = rows.join(F.broadcast(med), "grp")
    mad = (
        with_med.groupBy("grp")
        .agg(F.percentile(F.abs(F.col("v") - F.col("med")), 0.5).alias("mad"))
    )
    return (
        with_med.join(F.broadcast(mad), "grp")
        .select(
            "id",
            F.col("grp").alias(group_col),
            F.col("v").alias(value_col),
            F.when(
                F.col("mad") > 0,
                F.lit(_MZ) * (F.col("v") - F.col("med")) / F.col("mad"),
            ).alias("robust_z"),
        )
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("robust_z")) > z_thresh, F.lit(False)),
        )
    )
