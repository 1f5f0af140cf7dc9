"""Maximal independent set by deterministic Luby rounds.

Link-graph analytics op alongside SURVEY.md §2.6 (not in the reference —
grandiso has no analytics passes).  networkx's
``maximal_independent_set`` is RNG-driven and therefore not a usable
distributed oracle; instead the *properties* (independence +
maximality) are pinned in pytest on every fixture, and the exact output
is value-checked against an unrolled SQL replay of the same
deterministic priority arithmetic (the engine's portable-hash
convention: ``md5(id|round|seed)``).

Semantics: undirected simple graph (orientation ignored, self-loops
dropped — a self-loop would make its vertex ineligible under the
classic definition, so loops are removed first, matching the other
peeling ops).  Output: ``(id)`` — an independent set no vertex can be
added to.

Scale shape — classic Luby, level-synchronous:

- Per round every live vertex draws a fresh portable priority (pure
  column expression, re-derived identically under any retry).  A vertex
  joins the MIS iff its ``(priority, id)`` struct is strictly smaller
  than every live neighbor's — ONE edge⋈priority join +
  ``groupBy(v).min(struct)`` (map-side combine absorbs hub fan-in),
  then a null-safe comparison (no live neighbors → selected).
- Winners AND their neighbors leave the live set via two anti joins;
  the live edge frame shrinks to edges with both endpoints live.
- Fresh independent draws per round give the textbook O(log n) expected
  rounds; everything is ``localCheckpoint``-ed per round (flat
  lineage) like the engine's other iterative passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import symmetrize


def _priority(col, rnd, seed: int):
    """Portable md5-affine priority — bit-identical in DuckDB:
    ``CAST('0x' || substring(md5(id|round|seed), 1, 15) AS BIGINT)``."""
    from ..functions.hashing import hash60_keyed

    return hash60_keyed(col, F.lit(rnd), F.lit(seed))


def maximal_independent_set(
    edges: DataFrame,
    seed: int = 42,
    max_iter: int = 200,
) -> DataFrame:
    """``(id)`` — a maximal independent set of the simple undirected
    graph; a pure function of ``(edge set, seed)`` regardless of
    partitioning or retries."""
    sym = symmetrize(edges.where(F.col("src") != F.col("dst"))).localCheckpoint()
    spark = edges.sparkSession
    id_t = dict(
        (f.name, f.dataType.simpleString()) for f in sym.schema.fields
    )["src"]
    live_v = (
        sym.select(F.col("src").alias("id")).distinct().localCheckpoint()
    )
    # Vertices that only appeared in self-loops or isolated inputs never
    # reach `sym`; the caller's vertex frame would add them — over a pure
    # edge table, loop-only vertices are independent of everything and
    # belong in the MIS.
    loop_only = (
        edges.where(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("id"))
        .distinct()
        .join(live_v, "id", "left_anti")
    )
    chosen = spark.createDataFrame([], f"id {id_t}").unionByName(loop_only)
    live_e = sym
    for rnd in range(max_iter):
        if live_v.limit(1).count() == 0:
            return chosen.transform(flat_checkpoint)
        pri = live_v.select(
            "id", _priority(F.col("id"), rnd, seed).alias("p")
        )
        # Min neighbor (priority, id) per live vertex; vertices with no
        # live neighbors get null = auto-selected.
        nbr_min = (
            live_e.join(
                pri.select(F.col("id").alias("dst"), "p", F.col("id").alias("nid")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.min(F.struct(F.col("p"), F.col("nid"))).alias("nm"))
        )
        sel = (
            pri.join(nbr_min, "id", "left")
            .where(
                F.col("nm").isNull()
                | (F.struct(F.col("p"), F.col("id")) < F.col("nm"))
            )
            .select("id")
            .transform(flat_checkpoint)
        )
        chosen = chosen.unionByName(sel).transform(flat_checkpoint)
        # Winners + their neighbors leave the live set.
        closed = sel.unionByName(
            live_e.join(sel.withColumnRenamed("id", "src"), "src").select(
                F.col("dst").alias("id")
            )
        ).distinct()
        live_v = live_v.join(closed, "id", "left_anti").transform(flat_checkpoint)
        live_e = (
            live_e.join(live_v.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(live_v.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .transform(flat_checkpoint)
        )
    raise RuntimeError(f"Luby MIS did not converge in {max_iter} rounds.")
