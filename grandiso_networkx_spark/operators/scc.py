"""Strongly connected components (extra op, beyond the north rule —
the directed counterpart of operators/components.py).

Distributed "coloring" algorithm (Orzan; the standard MapReduce/Pregel
SCC formulation):

1. **Color**: forward min-label propagation to a fixpoint — color(v) =
   min vertex id that can reach v (including itself), computed exactly
   like HashMin but along stored edge orientation only, with the same
   pure-gather trick (self-loops carry each vertex's own color through
   the round, so the state is consumed once and rounds chain into
   unrolled windows).
2. **Confirm**: a root is a vertex whose color is itself.  Backward BFS
   from the roots over edges whose BOTH endpoints share a color — every
   reached vertex v with color r both reaches r (it was colored r
   through a forward path... color r reached v) and is reached from r
   backward within the color class, so {v : confirmed} is exactly the
   SCC of r.
3. **Peel**: confirmed vertices and their edges drop out; repeat on the
   residual graph.  Each peel round removes at least every source SCC
   of the condensation, so the loop terminates.

Exactness vs ``nx.strongly_connected_components`` (as a partition,
component id = min member) is pinned by pytest; the driver check is
rows-only (convergence loops are not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def strongly_connected_components(
    edges: DataFrame,
    max_iter: int = 200,
    unroll: int = 4,
) -> DataFrame:
    """``(id, component)`` over the directed graph: component id = the
    lexicographically smallest member of each SCC.  Includes every
    endpoint (a vertex with no cycle through it is its own SCC)."""
    spark = edges.sparkSession
    e_all = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    verts = (
        e_all.select(F.col("src").alias("id"))
        .unionAll(e_all.select(F.col("dst").alias("id")))
        .unionAll(
            edges.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias("id")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    id_type = verts.schema["id"].dataType.simpleString()
    done = spark.createDataFrame([], f"id {id_type}, component {id_type}")
    e = e_all
    remaining = verts
    from ..functions.width import narrowed_shuffle

    with narrowed_shuffle(spark, e_all.count()):
        for _peel in range(max_iter):
            n_left = remaining.count()
            if n_left == 0:
                return done
            # -- 1. forward min-color to fixpoint (gather w/ self-loops)
            e_self = e.unionAll(
                remaining.select(
                    F.col("id").alias("src"), F.col("id").alias("dst")
                )
            ).transform(flat_checkpoint)
            colors = remaining.select("id", F.col("id").alias("color"))
            colors = colors.transform(flat_checkpoint)
            for _ in range(max_iter):
                cur = colors
                for _j in range(unroll):
                    cur = (
                        e_self.join(cur.withColumnRenamed("id", "src"), "src")
                        .groupBy(F.col("dst").alias("id"))
                        .agg(F.min("color").alias("color"))
                    )
                new_colors = (
                    cur.join(
                        colors.select("id", F.col("color").alias("__old")), "id"
                    )
                    .select(
                        "id",
                        "color",
                        (F.col("color") != F.col("__old")).alias("__ch"),
                    )
                    .transform(flat_checkpoint)
                )
                changed = new_colors.where("__ch").limit(1).count()
                colors = new_colors.drop("__ch")
                if changed == 0:
                    break
            else:
                raise RuntimeError(
                    f"SCC coloring did not converge in {max_iter}"
                )
            # -- 2. backward BFS from roots inside each color class
            ce = (
                e.join(colors.withColumnRenamed("id", "src"), "src")
                .withColumnRenamed("color", "c_src")
                .join(colors.withColumnRenamed("id", "dst"), "dst")
                .where(F.col("c_src") == F.col("color"))
                .select("src", "dst", F.col("color").alias("c"))
                .transform(flat_checkpoint)
            )
            confirmed = (
                colors.where(F.col("id") == F.col("color"))
                .select("id", F.col("color").alias("component"))
                .transform(flat_checkpoint)
            )
            frontier = confirmed.select("id", "component")
            while True:
                nxt = (
                    frontier.join(ce.withColumnRenamed("dst", "id"), "id")
                    .where(F.col("component") == F.col("c"))
                    .select(F.col("src").alias("id"), "component")
                    .dropDuplicates(["id"])
                    .join(confirmed.select("id"), "id", "left_anti")
                    .transform(flat_checkpoint)
                )
                if nxt.limit(1).count() == 0:
                    break
                confirmed = confirmed.unionByName(nxt).transform(flat_checkpoint)
                frontier = nxt
            # -- 3. peel
            done = done.unionByName(confirmed).transform(flat_checkpoint)
            remaining = remaining.join(
                confirmed.select("id"), "id", "left_anti"
            )
            remaining = remaining.transform(flat_checkpoint)
            e = (
                e.join(
                    confirmed.select(F.col("id").alias("src")),
                    "src",
                    "left_anti",
                )
                .join(
                    confirmed.select(F.col("id").alias("dst")),
                    "dst",
                    "left_anti",
                )
                .select("src", "dst")
                .transform(flat_checkpoint)
            )
    raise RuntimeError(f"SCC peeling did not converge in {max_iter} rounds.")
