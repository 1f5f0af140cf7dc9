"""GNN-style neighborhood feature aggregation (task-mandated §2.7
class — the feature-propagation / graph-smoothing pass an embedding
training pipeline runs before or instead of message-passing layers).

``neighbor_mean_features`` computes, per vertex, the elementwise mean
of its in-neighbors' feature vectors (optionally including its own);
``feature_propagation`` iterates that smoothing ``rounds`` times with
the standard ``(1-alpha)·x + alpha·mean`` damping.

Scale shape — everything JVM-side, no Python in the loop:

- The vector column is ``posexplode``d to ``(id, pos, val)`` rows, so
  the aggregation is a plain ``groupBy(id, pos).avg`` with map-side
  partial aggregation — a hub vertex's million in-neighbor values
  combine locally before the exchange, and no executor ever holds a
  ``collect_list`` of whole neighbor vectors (the naive formulation
  that OOMs on hubs).  Work is |E|·d rows of primitives inside
  whole-stage codegen; d (the vector width) is a small constant.
- Reassembly is ``collect_list(struct(pos, val))`` per vertex —
  exactly d structs, bounded — followed by ``array_sort`` +
  ``transform`` (positional order restored deterministically;
  ``collect_list`` order alone is not stable under retries).
- One shuffle per round (the (id, pos) exchange); the |V|-row feature
  frame is ``localCheckpoint``-ed between rounds like every other
  iterative pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def neighbor_mean_features(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    include_self: bool = False,
) -> DataFrame:
    """``(id, vec array<double>)`` — elementwise mean over the feature
    vectors of each vertex's in-neighbors (``src -> dst`` contributes
    src's vector to dst); vertices with no in-edges are absent unless
    ``include_self`` (which adds every vertex's own vector to its own
    mean and therefore keeps all vertices)."""
    feats = features.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    contrib = edges.select("src", "dst").join(
        feats.withColumnRenamed("id", "src"), "src"
    ).select(F.col("dst").alias("id"), "vec")
    if include_self:
        contrib = contrib.unionByName(feats)
    ex = contrib.select("id", F.posexplode("vec").alias("pos", "v"))
    agg = ex.groupBy("id", "pos").agg(F.avg("v").alias("m"))
    return agg.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("vec")
    )


def feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    rounds: int = 2,
    alpha: float = 0.5,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Iterated smoothing ``x' = (1-alpha)·x + alpha·neighbor_mean(x)``
    (vertices with no in-edges keep their vector).  Returns
    ``(id, vec array<double>)`` after ``rounds`` rounds."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    x = features.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("vec"),
    ).localCheckpoint()
    e = edges.select("src", "dst").localCheckpoint()
    for _ in range(rounds):
        nm = neighbor_mean_features(e, x).withColumnRenamed("vec", "nvec")
        x = (
            x.join(nm, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("nvec").isNull(), F.col("vec")
                )
                .otherwise(
                    F.zip_with(
                        "vec",
                        "nvec",
                        lambda a, b: F.lit(1.0 - alpha) * a + F.lit(alpha) * b,
                    )
                )
                .alias("vec"),
            )
            .transform(flat_checkpoint)
        )
    return x
