"""Minimum spanning forest by distributed Borůvka rounds.

Link-graph analytics op alongside SURVEY.md §2.6 (not in the reference —
grandiso has no analytics passes; semantics oracle is
``networkx.minimum_spanning_edges(algorithm="boruvka")`` — with
distinct weights the forest is unique, so the edge sets match exactly;
under weight ties our deterministic ``(weight, src, dst)`` tie-break
still yields A minimum forest of the same total weight).

Semantics: undirected weighted simple graph — orientation ignored,
self-loops dropped, parallel edges collapsed to the canonical
``(min_id, max_id)`` pair keeping the lexicographically smallest
``(weight, src, dst)``.  Output is the spanning forest over every
component.

Scale shape — the classic O(log n)-round Borůvka:

- **Round**: relabel edge endpoints to their current component (two
  |E|⋈|V| equi joins), drop intra-component edges (the edge frame
  shrinks monotonically), then ONE ``groupBy(component).min(struct)``
  picks each component's cheapest outgoing edge — map-side partial
  aggregation, so a hub component never concentrates a reducer.
- **Merge**: the ≤|C| selected edges form the contraction graph; its
  components (computed with the engine's own large-star/small-star
  pass, O(log) regardless of chain length — Borůvka's merge chains CAN
  be long under gradient weights) become the new labels via one |C|-row
  mapping join against the vertex frame.
- Components at least halve per round → ≤ log2(n) rounds; per round
  the only |E|-scale work is the two relabel joins and the min-agg.
  The label and edge frames are ``localCheckpoint``-ed per round
  (flat lineage), like every other iterative pass in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import connected_components_star


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_iter: int = 64,
) -> DataFrame:
    """``(src, dst, weight double)`` with ``src < dst`` — the edges of
    a minimum spanning forest of the undirected weighted graph.

    Deterministic: weight ties break on the canonical ``(src, dst)``
    pair, so the result is a pure function of the input regardless of
    partitioning or retries.
    """
    w = F.col(weight_col).cast("double")
    # Canonical simple weighted edges: (a<b, min weight for the pair).
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            w.alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .localCheckpoint()
    )
    spark = edges.sparkSession
    id_t = dict((f.name, f.dataType.simpleString()) for f in e.schema.fields)[
        "src"
    ]
    chosen = spark.createDataFrame([], f"src {id_t}, dst {id_t}, weight double")

    # labels: (id, comp); start as singletons.
    labels = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint()
    )
    # work: current edges with endpoint components attached.
    work = e
    for _ in range(max_iter):
        lab_s = labels.select(F.col("id").alias("src"), F.col("comp").alias("cu"))
        lab_d = labels.select(F.col("id").alias("dst"), F.col("comp").alias("cv"))
        xe = (
            work.join(lab_s, "src")
            .join(lab_d, "dst")
            .where(F.col("cu") != F.col("cv"))
            .transform(flat_checkpoint)
        )
        if xe.limit(1).count() == 0:
            break
        # Each component's cheapest incident cross edge, ties broken on
        # the canonical (weight, src, dst) struct order — min over a
        # struct is one map-side-combined agg.
        pick = F.min(F.struct("weight", "src", "dst")).alias("m")
        sel = (
            xe.select(F.col("cu").alias("c"), "weight", "src", "dst")
            .unionAll(xe.select(F.col("cv").alias("c"), "weight", "src", "dst"))
            .groupBy("c")
            .agg(pick)
            .select(
                F.col("m.src").alias("src"),
                F.col("m.dst").alias("dst"),
                F.col("m.weight").alias("weight"),
            )
            .dropDuplicates(["src", "dst"])
            .transform(flat_checkpoint)
        )
        chosen = chosen.unionByName(sel).transform(flat_checkpoint)
        # Contract: components of the selected-edge graph over comp ids
        # give the merged labels (large/small star — merge chains can be
        # long under gradient weights, HashMin would pay O(chain)).
        sel_c = (
            sel.join(lab_s, "src")
            .join(lab_d, "dst")
            .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        )
        mapping = connected_components_star(sel_c).select(
            F.col("id").alias("comp"), F.col("component").alias("new_comp")
        )
        labels = (
            labels.join(mapping, "comp", "left")
            .select(
                "id", F.coalesce("new_comp", F.col("comp")).alias("comp")
            )
            .transform(flat_checkpoint)
        )
        # Shrink the edge frame: intra-component edges never come back.
        work = xe.select("src", "dst", "weight")
    else:
        raise RuntimeError(
            f"Boruvka did not converge in {max_iter} rounds."
        )
    return chosen
