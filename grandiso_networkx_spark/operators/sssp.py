"""Weighted single-source shortest paths (extra op, beyond the north
rule; completes the traversal family next to operators/bfs.py).

Frontier Bellman-Ford: each round relaxes only edges leaving vertices
whose distance improved last round (the frontier), takes the per-dst
min of tentative distances (map-side combine), and joins against the
running distance table to keep strict improvements.  With non-negative
weights this terminates after at most (longest shortest path in hops)
rounds — the frontier-queue shape the engine uses everywhere, so hubs
are absorbed by the same partial-aggregation argument as PageRank's
gather.

Exactness vs ``nx.single_source_dijkstra_path_length`` is pinned by
pytest; ``fixed_rounds`` runs exactly that many relaxation rounds
(value-checkable against an unrolled-CTE SQL oracle, exact whenever
``fixed_rounds`` >= the hop-diameter of the reachable component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def sssp(
    edges: DataFrame,
    source,
    weight_col: str | None = None,
    directed: bool = True,
    max_rounds: int = 10_000,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """``(id, dist double)`` for every vertex reachable from ``source``.

    ``weight_col=None`` means unit weights (then this is BFS with a
    double-typed distance).  Negative weights raise ``ValueError``
    (Bellman-Ford would need |V| rounds and negative-cycle detection;
    out of scope for a link graph's non-negative costs).
    """
    spark = edges.sparkSession
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))
    if not directed:
        e = e.unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), w.alias("w")
            )
        )
    e = e.where(F.col("src") != F.col("dst")).persist()
    if e.where(F.col("w") < 0).limit(1).count() > 0:
        e.unpersist()
        raise ValueError("sssp requires non-negative weights")

    id_type = edges.schema["src"].dataType.simpleString()
    dist = spark.createDataFrame(
        [(source, 0.0)], f"id {id_type}, dist double"
    ).localCheckpoint()
    frontier = dist
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for _ in range(rounds):
        cand = (
            frontier.join(e.withColumnRenamed("src", "id"), "id")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        improved = (
            cand.join(dist, "id", "left")
            .where(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("id", F.col("cand").alias("dist"))
            .transform(flat_checkpoint)
        )
        if improved.limit(1).count() == 0:
            e.unpersist()
            return dist
        dist = (
            dist.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .transform(flat_checkpoint)
        )
        frontier = improved
    e.unpersist()
    if fixed_rounds is not None:
        return dist
    raise RuntimeError(f"sssp did not stabilize within max_rounds={max_rounds}")
