"""Connected components via iterative min-label propagation (HashMin).

North-rule op (SURVEY.md §2.6).  Component id = the lexicographically
smallest vertex id in the component (canonical-min labeling), exact vs
``nx.connected_components`` as a partition of the vertex set.

Each round: every vertex takes the min of its own label and its
neighbors' labels.  The symmetrized edge table carries one self-loop
per vertex, so the round is a single join + ``groupBy(id).min`` pure
gather (no separate update join), the state is consumed once per
round, and several rounds compose into one plan between
materializations (``unroll``).  ``groupBy(id).min`` gets map-side
partial aggregation, so hub vertices combine locally before the
shuffle.  Converges in O(diameter) windows; labels are checkpointed
per round when a manager is attached — HashMin's label column is tiny,
so rounds are cheap even at 10^12-edge scale; for pathological
high-diameter graphs use :func:`connected_components_star`
(O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from ..checkpoint import CheckpointManager

# A HashMin/star round is a single narrow join + min-agg — the width
# sweep at 4.1M sym rows / local[32] put the knee at ~16 partitions
# (64: 12.7s, 40: 6.5s, 16: 5.8s, 8: 7.9s warm); see functions/width.py.
from ..functions.width import narrowed_shuffle as _narrowed_shuffle


def symmetrize(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
    )


def connected_components_star(
    edges: DataFrame,
    max_iter: int = 64,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., *Connected Components in MapReduce and
    Beyond*, SoCC'14) — converges in O(log n) rounds independent of
    graph diameter, the scale path for high-diameter hosts where
    HashMin's O(diameter) rounds (see :func:`connected_components`)
    would dominate.  Same output contract: ``(id, component)`` with the
    component id = its lexicographically smallest member.

    Each round is two groupBy-min + join passes over the current edge
    multiset; map-side partial aggregation absorbs hub fan-in, and the
    edge set shrinks monotonically toward a star forest.  Convergence
    = the parent mapping stops changing (exact check on the
    materialized frame, no extra join).
    """
    # Drop self-loops; remember every vertex for the final output.
    e0 = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    verts = (
        e0.select(F.col("src").alias("id"))
        .unionAll(e0.select(F.col("dst").alias("id")))
        .unionAll(
            edges.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias("id")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    e = e0.dropDuplicates(["src", "dst"]).localCheckpoint()

    start = 0
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            start, e = resumed
            start += 1

    def _large_star(ed: DataFrame) -> DataFrame:
        # Per node u over BOTH orientations: m(u) = min(Γ(u) ∪ {u});
        # emit (v, m(u)) for every neighbor v > u.
        both = ed.unionAll(
            ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = (
            both.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select("src", F.least("src", "__mn").alias("__m"))
        )
        return (
            both.join(m, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # Orient every pair (max, min); per node u: m = min(Γ<(u) ∪
        # {u}); emit (v, m) for v ∈ Γ<(u) ∪ {u}, minus the (m, m) loop.
        se = ed.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).dropDuplicates(["src", "dst"])
        m = se.groupBy("src").agg(F.min("dst").alias("__m"))
        children = se.join(m, "src").select(
            F.col("dst").alias("src"), F.col("__m").alias("dst")
        )
        selfe = m.select("src", F.col("__m").alias("dst"))
        return (
            children.unionAll(selfe)
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )

    with _narrowed_shuffle(edges.sparkSession, e.count()):
        for it in range(start, max_iter):
            new_e = _small_star(_large_star(e))
            if checkpoint is not None and it % checkpoint_every == 0:
                new_e = checkpoint.save(it, new_e)
            else:
                new_e = new_e.transform(flat_checkpoint)
            # Exact convergence: the (symmetric-closure-free) edge sets
            # of two star-forest rounds are equal iff nothing moved.
            # Both frames are (src, dst)-distinct, so the symmetric
            # difference is exactly the groups the tagged union sees
            # only once — ONE shuffle with map-side combine over both
            # materialized frames, where the exceptAll ∪ exceptAll
            # formulation paid two full-frame set-differences.
            changed = (
                new_e.select("src", "dst")
                .unionAll(e.select("src", "dst"))
                .groupBy("src", "dst")
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") == 1)
                .limit(1)
                .count()
            )
            if checkpoint is not None and it % checkpoint_every == 0:
                checkpoint.annotate(it, {"edges_changed": changed})
            e = new_e
            if changed == 0:
                # Star forest: every non-root points at its component
                # min.
                return (
                    verts.join(e.withColumnRenamed("src", "id"), "id", "left")
                    .select("id", F.coalesce("dst", "id").alias("component"))
                )
    raise RuntimeError(f"star contraction did not converge in {max_iter} rounds.")


def connected_components(
    edges: DataFrame,
    max_iter: int = 200,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 4,
    unroll: int | None = None,
) -> DataFrame:
    """``(id string, component string)`` for the undirected graph of
    ``edges`` (orientation ignored).  Includes isolated endpoints.

    A HashMin round here is a PURE GATHER: the symmetrized edge set
    carries a self-loop per vertex, so ``min over nbrs ∪ {self}`` is
    one join + one ``groupBy().min`` — no separate update join (the
    self-loop guarantees every vertex survives the gather and its own
    label participates in the min).  Because the evolving state is
    consumed exactly once per round, ``unroll`` rounds compose into
    one linear plan between materializations (the same driver-job
    amortization as PageRank's unroll; exact — HashMin is monotone and
    idempotent at the fixpoint, so a window can only land ON the
    fixpoint, never past a different answer).  Default: windows of 4
    (1 with a checkpoint manager, which saves per round).
    """
    sym = symmetrize(edges)
    verts = sym.select(F.col("src").alias("id")).distinct()
    sym_self = sym.unionAll(
        verts.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    ).persist()
    labels = verts.select("id", F.col("id").alias("component")).localCheckpoint()

    if unroll is None:
        unroll = 4
    unroll = max(1, int(unroll))
    if checkpoint is not None:
        unroll = 1  # per-round saves need per-round materialization

    start = 0
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            start, labels = resumed
            labels = labels.drop("__changed")  # saved frames carry the flag
            start += 1

    it = start
    with _narrowed_shuffle(edges.sparkSession, sym_self.count()):
        while it < max_iter:
            k = min(unroll, max_iter - it)
            cur = labels
            for _ in range(k):
                cur = (
                    sym_self.join(cur.withColumnRenamed("id", "src"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("component").alias("component"))
                )
            # The change flag joins against the WINDOW-START leaf (free
            # to scan again — it is materialized), so the convergence
            # test is one scan of the checkpointed result.
            new_labels = (
                cur.join(
                    labels.select("id", F.col("component").alias("__old")),
                    "id",
                )
                .select(
                    "id",
                    "component",
                    (F.col("component") != F.col("__old")).alias("__changed"),
                )
            )
            if checkpoint is not None and it % checkpoint_every == 0:
                new_labels = checkpoint.save(it, new_labels)
            else:
                new_labels = new_labels.transform(flat_checkpoint)
            changed = new_labels.where("__changed").count()
            if checkpoint is not None and it % checkpoint_every == 0:
                checkpoint.annotate(it, {"labels_changed": changed})
            labels = new_labels.drop("__changed")
            it += k
            if changed == 0:
                sym_self.unpersist()
                return labels
    sym_self.unpersist()
    raise RuntimeError(f"HashMin did not converge in {max_iter} rounds.")
