"""Deterministic distributed greedy graph coloring (Jones–Plassmann).

Link-graph analytics op alongside SURVEY.md §2.6 (not in the reference
— grandiso has no analytics passes).  networkx's ``greedy_color`` is
ordering-dependent and not a usable distributed oracle; instead the
*properties* (properness, ≤ Δ+1 colors) are pinned in pytest on every
fixture, and the exact output is value-checked against (a) a pure
python replay of the identical priority arithmetic and (b) an unrolled
MATERIALIZED-CTE SQL replay (driver check ``greedy_coloring``).

Semantics: undirected simple graph (orientation ignored, self-loops
dropped, as in the other peeling ops).  Every vertex draws ONE static
portable priority ``md5(id|color|seed)``; a vertex colors itself in
the round where no still-uncolored neighbor has a higher
``(priority, id)`` struct, taking the smallest color unused by its
already-colored neighbors.  Output is a pure function of
(edge set, seed) under any partitioning/retry.

Scale shape — level-synchronous JP:

- Readiness: ONE live-edges ⋈ priorities join + ``groupBy(v).max``
  (map-side combine absorbs hub fan-in), null-safe compare.
- Smallest-excluded-color WITHOUT set aggregation: the winner's color
  is always either 0 or (some colored neighbor's color)+1, so
  candidates = ready×{0} ∪ (neighbor color + 1), one anti join drops
  candidates already used by a neighbor, ``groupBy(id).min`` picks the
  answer — per-vertex work bounded by its colored-neighbor count, all
  equi joins, no ``collect_set`` (a hub never materializes its
  neighbor-color set on one executor).
- Expected O(log n / log log n) rounds on bounded-degree graphs
  (Jones & Plassmann, 1993); per-round ``localCheckpoint`` keeps
  lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import symmetrize
from .mis import _priority


def greedy_coloring(
    edges: DataFrame,
    seed: int = 42,
    max_iter: int = 500,
) -> DataFrame:
    """``(id, color int)`` — a proper coloring of the simple undirected
    graph, deterministic in (edge set, seed)."""
    sym = symmetrize(
        edges.where(F.col("src") != F.col("dst"))
    ).localCheckpoint()
    spark = edges.sparkSession
    id_t = dict(
        (f.name, f.dataType.simpleString()) for f in sym.schema.fields
    )["src"]
    pri_all = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", _priority(F.col("id"), "color", seed).alias("p"))
        .localCheckpoint()
    )
    # Vertices appearing only as self-loops: unconstrained on the
    # simple graph -> color 0 (consistent with MIS's loop_only rule).
    loop_only = (
        edges.where(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("id"))
        .distinct()
        .join(pri_all.select("id"), "id", "left_anti")
        .select("id", F.lit(0).alias("color"))
    )
    colored = spark.createDataFrame([], f"id {id_t}, color int").unionByName(
        loop_only
    )
    live_p = pri_all
    live_e = sym
    for _ in range(max_iter):
        if live_p.limit(1).count() == 0:
            return colored.transform(flat_checkpoint)
        # Ready: own (p, id) beats every live neighbor's.
        nbr_max = (
            live_e.join(
                live_p.select(
                    F.col("id").alias("dst"), "p", F.col("id").alias("nid")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.max(F.struct(F.col("p"), F.col("nid"))).alias("nm"))
        )
        ready = (
            live_p.join(nbr_max, "id", "left")
            .where(
                F.col("nm").isNull()
                | (F.struct(F.col("p"), F.col("id")) > F.col("nm"))
            )
            .select("id")
            .transform(flat_checkpoint)
        )
        # Colored-neighbor colors of ready vertices.
        ncol = (
            sym.join(ready.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(
                colored.withColumnRenamed("id", "dst"),
                "dst",
            )
            .select(F.col("src").alias("id"), "color")
            .distinct()
        )
        # Smallest excluded color = min over ({0} U {used+1}) \ used.
        cand = ready.select("id", F.lit(0).alias("m")).unionByName(
            ncol.select("id", (F.col("color") + 1).alias("m"))
        )
        picked = (
            cand.join(
                ncol.select("id", F.col("color").alias("m")),
                ["id", "m"],
                "left_anti",
            )
            .groupBy("id")
            .agg(F.min("m").cast("int").alias("color"))
        )
        colored = colored.unionByName(picked).transform(flat_checkpoint)
        live_p = live_p.join(ready, "id", "left_anti").transform(flat_checkpoint)
        live_e = (
            live_e.join(
                live_p.select(F.col("id").alias("src")), "src", "left_semi"
            )
            .join(
                live_p.select(F.col("id").alias("dst")), "dst", "left_semi"
            )
            .transform(flat_checkpoint)
        )
    raise RuntimeError(f"JP coloring did not converge in {max_iter} rounds.")
