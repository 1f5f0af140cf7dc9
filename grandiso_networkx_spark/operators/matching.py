"""Distributed maximal matching by locally-dominant edge selection
(handshake matching; Preis 1999 / Manne–Bisseling 2007) — §2.6-class
analytics op, no reference analogue.

Each round every vertex points at its best incident edge (smallest
``(priority, src, dst)``); an edge enters the matching iff BOTH
endpoints point at it (a "handshake" — locally dominant), then both
endpoints retire and their edges drop.  Unweighted priority is the
portable 60-bit md5 hash of the canonical pair (deterministic under
any partitioning/retry, SQL-replayable); the weighted variant orders
by ``(-weight, src, dst)`` instead, which makes the result the
locally-heaviest matching — the classic 1/2-approximation of maximum
weight matching and the standard aggregation step of multilevel graph
coarsening.

Scale shape per round: two map-side-combined ``groupBy(endpoint)
.min(struct)`` passes + one equi self-join of the two picks + two
anti joins retiring matched vertices; expected O(log n) rounds, edge
frame shrinks monotonically and is ``localCheckpoint``-ed per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint
from ..functions.hashing import hash60_keyed
from .components import symmetrize


def maximal_matching(
    edges: DataFrame,
    weight_col: str | None = None,
    seed: int = 42,
    max_iter: int = 200,
) -> DataFrame:
    """``(src, dst)`` (+ ``weight`` when weighted) with ``src < dst`` —
    a maximal matching: no two output edges share a vertex, and every
    input edge has at least one matched endpoint.  Pure function of
    ``(edge set[, weights], seed)``.

    ``weight_col=None``: priority = portable md5 of ``min|max|seed``
    (uniform random matching).  With a weight column: priority =
    ``(-weight, src, dst)`` — greedy locally-heaviest, total weight
    ≥ 1/2 · maximum-weight matching.
    """
    if weight_col is None:
        e = (
            symmetrize(edges)
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .withColumn(
                "p",
                hash60_keyed(
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                    F.lit(str(seed)),
                ),
            )
        )
    else:
        und = edges.where(F.col("src") != F.col("dst")).select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col(weight_col).cast("double").alias("w"),
        )
        # duplicate orientations/rows resolve to the max weight
        e = (
            und.groupBy("src", "dst")
            .agg(F.max("w").alias("w"))
            .withColumn("p", -F.col("w"))
        )
    cols = ["src", "dst"] + (["w"] if weight_col is not None else [])
    e = e.localCheckpoint()
    spark = edges.sparkSession
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in e.select(*cols).schema
    )
    matched = spark.createDataFrame([], schema)
    for _ in range(max_iter):
        if e.limit(1).count() == 0:
            return matched
        pick_s = F.struct("p", "src", "dst")
        stacked = e.select(F.col("src").alias("v"), pick_s.alias("s")).unionAll(
            e.select(F.col("dst").alias("v"), pick_s.alias("s"))
        )
        best = stacked.groupBy("v").agg(F.min("s").alias("s"))
        # handshake: the edge both endpoints picked
        hs = (
            best.select(F.col("s.src").alias("src"), F.col("s.dst").alias("dst"), "s")
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == 2)
            .select("src", "dst")
        )
        new = e.join(hs, ["src", "dst"], "left_semi").select(*cols)
        matched = matched.unionByName(new).transform(flat_checkpoint)
        used = (
            new.select(F.col("src").alias("v"))
            .unionAll(new.select(F.col("dst").alias("v")))
            .distinct()
        )
        e = (
            e.join(used.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(used.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select("src", "dst", "p", *(["w"] if weight_col else []))
            .transform(flat_checkpoint)
        )
    raise RuntimeError(f"matching did not converge in {max_iter} rounds.")


def vertex_cover_2approx(
    edges: DataFrame, seed: int = 42
) -> DataFrame:
    """``(id)`` — a vertex cover at most 2x the minimum (the classic
    maximal-matching bound: every cover must hit each matched edge at
    least once, and this cover spends exactly two per matched edge).
    Deterministic: the endpoints of :func:`maximal_matching` under the
    same portable-hash priorities.

    Cover property is structural: an uncovered edge would have both
    endpoints unmatched, contradicting the matching's maximality.
    """
    m = maximal_matching(edges, seed=seed)
    return (
        m.select(F.col("src").alias("id"))
        .unionAll(m.select(F.col("dst").alias("id")))
        .distinct()
    )
