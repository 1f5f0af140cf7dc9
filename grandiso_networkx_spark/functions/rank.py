"""Parallel global ranking — the engine's replacement for
single-partition `row_number() OVER (ORDER BY ...)` windows.

``global_row_number`` computes each row's 1-based ROW NUMBER (a
1..N total-order rank — equal keys would get distinct positions,
which is why the caller contract below demands a unique tie-break;
it is NOT dense_rank) without ever forcing the data through one
task: range-partition
by the order expressions (equal keys never straddle a range
boundary), rank WITHIN each partition in parallel, then add
per-partition offsets — a running sum over the tiny partition-count
frame.  The partitioned input is ``localCheckpoint``-ed (one eager
job) to pin the sampled range boundaries so the size pass and the
rank pass see identical partitions.

Caller contract: ``order_exprs`` must define a total order (include a
unique tie-break column); otherwise ranks of tied rows depend on
partition-internal order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_row_number(
    df: DataFrame,
    order_exprs: list,
    nparts: int,
    out: str = "__rank",
) -> DataFrame:
    """Return ``df`` plus a 1-based ``out`` long column = the row's
    global rank under ``order_exprs`` — computed with parallel
    windows, never a single-partition sort."""
    parted = (
        df.repartitionByRange(max(nparts, 1), *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "__pid", F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__off")
    )
    wrank = Window.partitionBy("__pid").orderBy(*order_exprs)
    return (
        parted.join(F.broadcast(offs), "__pid")
        .withColumn(
            out, (F.col("__off") + F.row_number().over(wrank)).cast("long")
        )
        .drop("__pid", "__off")
    )
