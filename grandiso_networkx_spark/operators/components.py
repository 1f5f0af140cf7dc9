"""Connected components via iterative min-label propagation (HashMin).

North-rule op (SURVEY.md §2.6).  Component id = the lexicographically
smallest vertex id in the component (canonical-min labeling), exact vs
``nx.connected_components`` as a partition of the vertex set.

Each round: every vertex takes the min of its own label and its
neighbors' labels — one join + one aggregation over the symmetrized
edge table; converges in O(diameter) rounds.  ``groupBy(id).min`` gets
map-side partial aggregation, so hub vertices combine locally before
the shuffle.  State (the labels DataFrame) is checkpointed per round —
HashMin's label column is tiny, so rounds are cheap even at
10^12-edge scale; for pathological high-diameter graphs the
large-star/small-star doubling variant is the planned upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import CheckpointManager


def symmetrize(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 200,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """``(id string, component string)`` for the undirected graph of
    ``edges`` (orientation ignored).  Includes isolated endpoints."""
    sym = symmetrize(edges).persist()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )

    start = 0
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            start, labels = resumed
            labels = labels.drop("__changed")  # saved frames carry the flag
            start += 1

    for it in range(start, max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_label = F.least("component", F.coalesce("nbr_component", "component"))
        # The change flag rides along in the materialized frame, so the
        # convergence test is a scan of the checkpointed result — no
        # old-vs-new re-join (one fewer shuffle per round).
        new_labels = labels.join(nbr_min, "id", "left").select(
            "id",
            new_label.alias("component"),
            (new_label != F.col("component")).alias("__changed"),
        )
        if checkpoint is not None and it % checkpoint_every == 0:
            new_labels = checkpoint.save(it, new_labels)
        else:
            new_labels = new_labels.localCheckpoint()
        changed = new_labels.where("__changed").count()
        if checkpoint is not None and it % checkpoint_every == 0:
            checkpoint.annotate(it, {"labels_changed": changed})
        labels = new_labels.drop("__changed")
        if changed == 0:
            sym.unpersist()
            return labels
    sym.unpersist()
    raise RuntimeError(f"HashMin did not converge in {max_iter} rounds.")
