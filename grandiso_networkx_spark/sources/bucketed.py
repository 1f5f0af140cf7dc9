"""Bucketed edge-table sink — the shuffle-elimination strategy for
repeated joins at 100 TB scale.

The reference holds its host graph in process memory
(`/root/reference/grandiso/__init__.py:358` — an nx adjacency dict);
the distributed analogue of "adjacency lookup is free" is a
**bucketed, sorted parquet table**: `bucketBy(src)` pre-shuffles the
edge table ONCE at write time, so every later equi join or aggregation
keyed on `src` (motif expansion rounds, wedge self-joins for
triangles/link prediction, PageRank gathers against a static graph)
reads co-located buckets and skips its Exchange entirely.  On a
1000-executor cluster that converts the per-query O(E) shuffle into a
one-time write cost amortized over every query against the graph.

Bucket metadata lives in the session catalog (`saveAsTable`), which is
what lets the planner prove co-location; a bare `parquet(path)` write
cannot (Spark drops bucket info on path-based reads).  Sorting within
buckets additionally removes the Sort under SortMergeJoin.

Verified by a plan-shape test (tests/test_bucketed.py): the bucketed
self-join plan contains NO Exchange, the plain one does, and both
produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "src",
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``edges`` as a parquet table bucketed (and by default
    sorted) by ``key``.  ``buckets`` should be sized like shuffle
    partitions at the target scale (a power of two lets downstream
    engines coalesce pairs of buckets evenly)."""
    w = edges.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the planner to see bucket metadata
    (reading the parquet path directly loses it)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
