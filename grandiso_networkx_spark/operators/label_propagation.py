"""Synchronous label propagation with a deterministic tie-break.

North-rule op (SURVEY.md §2.6).  Community LPA is classically
randomized (``nx.algorithms.community.asyn_lpa`` shuffles); "exact
assignments at convergence" is only well-defined under a fixed rule, so
this engine pins one:

- all vertices update simultaneously from the previous round's labels
  (synchronous / Jacobi);
- a vertex adopts the most frequent label among its neighbors,
  ties broken by the lexicographically smallest label;
- isolated vertices keep their own label;
- stop when no label changes or after ``max_iter`` rounds (synchronous
  LPA can 2-cycle on bipartite structures — the round cap makes the
  result deterministic either way).

The single-node oracle in the test suite implements the identical rule,
so "exact" is checkable.  Dataflow per round: one join (labels onto the
symmetrized edges), one ``groupBy(id, label).count`` (map-side partial
agg absorbs hub fan-in), one windowed top-1 per vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..checkpoint import flat_checkpoint

from ..checkpoint import CheckpointManager
from .components import symmetrize


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    weight_col: str | None = None,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """``(id string, label string)`` after synchronous min-tie-break LPA.

    ``weight_col`` switches the neighbor-label score from frequency to
    summed edge weight (undirected weight = the sum over both stored
    orientations of a pair, pinned so "exact" stays well-defined); the
    tie-break rule is unchanged (max score, then smallest label).
    """
    if weight_col is None:
        sym = symmetrize(edges).withColumn("w", F.lit(1.0)).persist()
    else:
        und = edges.select(
            "src", "dst", F.col(weight_col).cast("double").alias("w")
        )
        sym = (
            und.unionAll(
                und.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
                )
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .persist()
        )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )

    start = 0
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            start, labels = resumed
            labels = labels.drop("__changed")  # saved frames carry the flag
            start += 1

    from ..functions.width import narrowed_shuffle

    w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("label"))
    with narrowed_shuffle(edges.sparkSession, sym.count()):
        for it in range(start, max_iter):
            nbr = sym.join(labels.withColumnRenamed("id", "src"), "src").select(
                F.col("dst").alias("id"), "label", "w"
            )
            freq = nbr.groupBy("id", "label").agg(F.sum("w").alias("n"))
            pick = (
                freq.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select("id", F.col("label").alias("new_label"))
            )
            picked = F.coalesce("new_label", "label")
            # Change flag rides in the materialized frame: the
            # convergence test is a scan of the checkpointed state, not
            # an old-vs-new re-join (one fewer shuffle per round).
            new_labels = labels.join(pick, "id", "left").select(
                "id",
                picked.alias("label"),
                (picked != F.col("label")).alias("__changed"),
            )
            if checkpoint is not None and it % checkpoint_every == 0:
                new_labels = checkpoint.save(it, new_labels)
            else:
                new_labels = new_labels.transform(flat_checkpoint)
            changed = new_labels.where("__changed").count()
            if checkpoint is not None and it % checkpoint_every == 0:
                checkpoint.annotate(it, {"labels_changed": changed})
            labels = new_labels.drop("__changed")
            if changed == 0:
                break
    sym.unpersist()
    return labels


def lpa_oracle(
    edge_list: list[tuple], max_iter: int = 10, weighted: bool = False
) -> dict:
    """Single-node reference implementation of the pinned LPA rule.

    Used by the test suite as the exactness oracle (there is no
    deterministic networkx equivalent).  ``weighted=True`` takes
    ``(u, v, w)`` triples and scores labels by summed undirected weight
    (both stored orientations of a pair add up), matching
    :func:`label_propagation`'s ``weight_col`` semantics.
    """
    from collections import defaultdict

    wadj: dict = defaultdict(lambda: defaultdict(float))
    for e in edge_list:
        if weighted:
            u, v, w = e
        else:
            u, v, w = e[0], e[1], 1.0
        wadj[u][v] += w
        wadj[v][u] += w
        if not weighted:
            # unweighted rule scores by *distinct-neighbor* frequency
            wadj[u][v] = 1.0
            wadj[v][u] = 1.0
    labels = {v: v for v in wadj}
    for _ in range(max_iter):
        new = {}
        for v in wadj:
            nbrs = wadj[v]
            if not nbrs or set(nbrs) == {v}:
                new[v] = labels[v]
                continue
            scores: dict = defaultdict(float)
            for u, w in nbrs.items():
                scores[labels[u]] += w
            best = max(scores.values())
            new[v] = min(l for l, s in scores.items() if s == best)
        if new == labels:
            break
        labels = new
    return labels


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 10,
) -> DataFrame:
    """Semi-supervised LPA: ``(id, label)`` where ``seeds`` (an
    ``(id, label)`` frame) are clamped to their given labels forever
    and every other vertex adopts, each synchronous round, the most
    frequent label among its LABELED neighbors (ties -> smallest
    label; no labeled neighbor -> unchanged, possibly still NULL).
    Stops at fixpoint or ``max_iter``.  Vertices never reached by any
    seed's influence keep a NULL label — the caller decides whether
    that means "unknown" or "own community".

    Same per-round dataflow as :func:`label_propagation` (one join,
    one map-side-combined groupBy, one windowed top-1), plus the seed
    clamp carried as a boolean column in the state frame — no extra
    shuffle.  Duplicate seed rows resolve to the smallest label (the
    engine's standard deterministic tie rule).
    """
    sym = symmetrize(edges).persist()
    verts = sym.select(F.col("src").alias("id")).distinct()
    s = seeds.groupBy("id").agg(F.min("label").alias("__seed"))
    labels = (
        verts.join(s, "id", "left")
        .select(
            "id",
            F.col("__seed").alias("label"),
            F.col("__seed").isNotNull().alias("is_seed"),
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(max_iter):
        nbr = sym.join(
            labels.where(F.col("label").isNotNull())
            .select(F.col("id").alias("src"), "label"),
            "src",
        ).select(F.col("dst").alias("id"), "label")
        freq = nbr.groupBy("id", "label").agg(F.count(F.lit(1)).alias("n"))
        pick = (
            freq.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        adopted = F.when(F.col("is_seed"), F.col("label")).otherwise(
            F.coalesce("new_label", "label")
        )
        new_labels = labels.join(pick, "id", "left").select(
            "id",
            adopted.alias("label"),
            "is_seed",
            (
                ~(adopted.eqNullSafe(F.col("label")))
            ).alias("__changed"),
        ).transform(flat_checkpoint)
        changed = new_labels.where("__changed").count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("id", "label")
