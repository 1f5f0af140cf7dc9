"""Time-respecting reachability: single-source earliest-arrival over a
temporal edge stream.

Not in the reference (grandiso's host graphs are static); on the
transcript/event graphs this engine targets, edges ARE timestamped
interactions, and "can A reach B" only means anything along paths
whose edge times never go backwards (Holme & Saramäki, "Temporal
networks", Phys. Reports 2012; the earliest-arrival formulation is
Wu et al., VLDB'14).

Semantics: over ``edges (src, dst, ts)`` (``ts``: integer-comparable,
e.g. ``unix_micros``), a path ``v0 →t1 v1 →t2 … →tk vk`` is
time-respecting iff ``start_ts <= t1 <= t2 <= … <= tk`` (non-strict).
``arrival(v)`` = minimum final-edge time over all such paths from the
source; the source itself arrives at ``start_ts``.

Scale shape — frontier Bellman-Ford on arrival times (the same
improved-frontier discipline as ``operators/sssp.py``):

- Per round, relax ONLY edges leaving vertices whose arrival improved
  last round: frontier ⋈ edges equi join on ``src`` with the
  ``ts >= arr`` residual, then ``groupBy(dst).min(ts)`` (map-side
  combine absorbs hub fan-in), then one left join + filter keeps the
  genuine improvements and merges them into the arrival table.
- Arrival values only decrease and the vertex set only grows, so with
  no improvements the fixed point is reached; rounds ≤ longest
  time-respecting shortest-path hop count.
- ``fixed_rounds`` mode: after k rounds the table holds EXACTLY the
  min arrival over ≤ k-hop time-respecting paths (both in Spark and
  in an unrolled-CTE SQL replay — the driver value check
  ``temporal_reach``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def earliest_arrival(
    edges: DataFrame,
    source,
    start_ts: int = 0,
    fixed_rounds: int | None = None,
    max_iter: int = 200,
) -> DataFrame:
    """``(id, arr long)`` — earliest time-respecting arrival from
    ``source`` (only reached vertices appear; the source row carries
    ``start_ts``)."""
    e = edges.select(
        "src", "dst", F.col("ts").cast("long").alias("t")
    ).localCheckpoint()
    spark = edges.sparkSession
    id_t = dict(
        (f.name, f.dataType.simpleString()) for f in e.schema.fields
    )["src"]
    arr = spark.createDataFrame(
        [(source, int(start_ts))], f"id {id_t}, arr long"
    ).localCheckpoint()
    frontier = arr

    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        if frontier.limit(1).count() == 0:
            break
        cand = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .where(F.col("t") >= F.col("arr"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("t").alias("new_arr"))
        )
        improved = (
            cand.join(arr, "id", "left")
            .where(F.col("arr").isNull() | (F.col("new_arr") < F.col("arr")))
            .select("id", F.col("new_arr").alias("arr"))
            .localCheckpoint()
        )
        arr = (
            arr.unionByName(improved)
            .groupBy("id")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint()
        )
        frontier = improved
    else:
        if fixed_rounds is None and frontier.limit(1).count() > 0:
            raise RuntimeError(
                f"earliest_arrival did not converge in {max_iter} rounds"
            )
    return arr
