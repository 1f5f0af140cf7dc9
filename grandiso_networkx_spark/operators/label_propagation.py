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

from ..checkpoint import CheckpointManager
from .components import symmetrize


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """``(id string, label string)`` after synchronous min-tie-break LPA."""
    sym = symmetrize(edges).persist()
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

    w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("label"))
    for it in range(start, max_iter):
        nbr = sym.join(labels.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "label"
        )
        freq = nbr.groupBy("id", "label").agg(F.count(F.lit(1)).alias("n"))
        pick = (
            freq.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        picked = F.coalesce("new_label", "label")
        # Change flag rides in the materialized frame: the convergence
        # test is a scan of the checkpointed state, not an old-vs-new
        # re-join (one fewer shuffle per round).
        new_labels = labels.join(pick, "id", "left").select(
            "id",
            picked.alias("label"),
            (picked != F.col("label")).alias("__changed"),
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
            break
    sym.unpersist()
    return labels


def lpa_oracle(edge_list: list[tuple[str, str]], max_iter: int = 10) -> dict:
    """Single-node reference implementation of the pinned LPA rule.

    Used by the test suite as the exactness oracle (there is no
    deterministic networkx equivalent).
    """
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in edge_list:
        adj[u].add(v)
        adj[v].add(u)
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        for v in adj:
            if not adj[v] or (adj[v] == {v}):
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in adj[v])
            best_n = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == best_n)
        if new == labels:
            break
        labels = new
    return labels
