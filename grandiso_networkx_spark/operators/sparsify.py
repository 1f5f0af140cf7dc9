"""Local similarity-based graph sparsification (L-Spar; Satuluri,
Parthasarathy & Ruan, SIGMOD 2011) — §2.6-class analytics op, no
reference analogue (the reference is a motif matcher).

Each vertex keeps its ``ceil(deg^e)`` most similar neighbors by the
Jaccard similarity of their neighborhoods (``|N(u)∩N(v)| /
|N(u)∪N(v)|``); the sparsified graph is the union of kept edges (an
edge survives if EITHER endpoint keeps it).  Community structure is
preserved while hub fan-out drops from ``d`` to ``d^e`` — the standard
preprocessing step before clustering a 10^11-edge graph.

Scale shape: per-edge common-neighbor counts come from the SAME
degree-ordered triangle enumeration the exact counter uses (wedge work
bounded m^(3/2) under any skew — a hub only fans out to higher-ordered
neighbors), degrees attach by two equi joins, and the per-vertex top-k
is one ``row_number`` window partitioned by vertex — (J desc, neighbor
asc) makes the cut deterministic.  With the default ``e = 0.5`` the
keep budget is ``ceil(sqrt(deg))`` computed with IEEE ``sqrt`` — bit
-identical in any SQL replay (no cross-engine ``pow``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .components import symmetrize
from .triangles import edge_embeddedness


def sparsify_similarity(edges: DataFrame, e: float = 0.5) -> DataFrame:
    """``(src, dst, jaccard)`` with ``src < dst`` — the L-Spar
    sparsifier's surviving undirected edges and their neighborhood
    Jaccard scores.

    ``e`` in (0, 1] is the sparsification exponent: each vertex keeps
    its top ``ceil(deg^e)`` neighbors (``e = 0.5`` → ``ceil(sqrt(
    deg))``, the paper's default).  Isolated tie groups cut
    deterministically by (jaccard desc, neighbor id asc).
    """
    if not (0 < e <= 1):
        raise ValueError("e must be in (0, 1]")
    und = symmetrize(edges).where(F.col("src") != F.col("dst")).persist()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    cn = edge_embeddedness(edges).select(
        "src", "dst", F.col("common_neighbors").alias("cn")
    )
    scored = (
        cn.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv")), "dst")
        .select(
            "src",
            "dst",
            (
                F.col("cn")
                / (F.col("du") + F.col("dv") - F.col("cn"))
            ).alias("jaccard"),
        )
    )
    # both directions rank independently; an edge survives if either
    # endpoint keeps it
    both = scored.unionAll(
        scored.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "jaccard"
        )
    )
    keep_n = (
        F.ceil(F.pow(F.col("deg"), F.lit(e)))
        if e != 0.5
        else F.ceil(F.sqrt(F.col("deg")))
    ).cast("long")
    budget = deg.select(F.col("id").alias("src"), keep_n.alias("__keep"))
    w = Window.partitionBy("src").orderBy(F.desc("jaccard"), F.asc("dst"))
    kept = (
        both.join(budget, "src")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("__keep"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "jaccard",
        )
        .distinct()
    )
    und.unpersist()
    return kept
