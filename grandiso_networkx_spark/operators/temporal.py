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

from ..checkpoint import flat_checkpoint


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
            .transform(flat_checkpoint)
        )
        arr = (
            arr.unionByName(improved)
            .groupBy("id")
            .agg(F.min("arr").alias("arr"))
            .transform(flat_checkpoint)
        )
        frontier = improved
    else:
        if fixed_rounds is None and frontier.limit(1).count() > 0:
            raise RuntimeError(
                f"earliest_arrival did not converge in {max_iter} rounds"
            )
    return arr


def temporal_motif_counts(
    edges: DataFrame,
    delta: float,
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal motif counts (Paranjape–Benson–Leskovec WWW'17) for the
    two canonical δ-bounded ordered motifs over a timestamped edge
    stream ``(src, dst, ts)`` — ``(motif, n)`` rows:

    - ``2path``:  u→v at t₁, v→w at t₂ with t₁ < t₂ ≤ t₁+δ and w ≠ u —
      the directed relay within a time window;
    - ``triangle``: the cyclic closure u→v, v→w, w→u at t₁ < t₂ < t₃
      with t₃ ≤ t₁+δ — the feedback-loop burst.

    Instances are counted over edge *events* (parallel edges at
    different times count separately — the paper's semantics), nodes
    pairwise distinct, timestamps strictly increasing inside a motif.

    Scale shape: each motif is a chain of equi joins on the shared
    vertex with the δ range as a join residual — work is bounded by
    the temporal adjacency (Σ per-vertex in×out within δ), never a
    time-unbounded self-join; both counts reuse the same first hop.
    ``ts`` may be numeric or timestamp (cast to double seconds).
    """
    e = edges.select(
        "src", "dst", F.col(ts_col).cast("double").alias("t")
    ).where(F.col("src") != F.col("dst"))
    e1 = e.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("t").alias("t1")
    )
    e2 = e.select(
        F.col("src").alias("v"), F.col("dst").alias("w"), F.col("t").alias("t2")
    )
    hop = e1.join(e2, "v").where(
        (F.col("t2") > F.col("t1"))
        & (F.col("t2") <= F.col("t1") + F.lit(delta))
        & (F.col("w") != F.col("u"))
    )
    two_path = hop.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("2path").alias("motif"), "n"
    )
    e3 = e.select(
        F.col("src").alias("w"), F.col("dst").alias("u2"), F.col("t").alias("t3")
    )
    tri = (
        hop.join(e3, "w")
        .where(
            (F.col("u2") == F.col("u"))
            & (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + F.lit(delta))
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("triangle").alias("motif"), "n")
    )
    return two_path.unionAll(tri)
