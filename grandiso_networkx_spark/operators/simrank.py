"""SimRank structural similarity (Jeh & Widom, KDD'02).

    s(a,a) = 1
    s(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i,j)

— two vertices are similar when their (in-)neighborhoods are similar,
the recursive generalization of co-citation.  Not in the reference
(which has no analytics); sits in the link-analysis family next to
SALSA/HITS (SURVEY.md §2.6) and matches
``networkx.simrank_similarity`` semantics with the default
``neighbors="in"`` (networkx DiGraph scoring uses predecessor
neighborhoods — the paper's definition; pinned by the pytest
differential, with ``neighbors="out"`` as the co-reference variant).

State is the sparse nonzero pair frame ``(a, b, s)`` — only pairs
co-reachable by equal-length reverse walks are ever nonzero, plus the
forced diagonal.  One round is two edge joins + one aggregate:

    s'(a,b) = C/(d(a)·d(b)) · Σ over (i→a), (j→b) of s(i,j)

then the diagonal is overwritten to 1.  SCALE HONESTY: all-pairs
SimRank is inherently quadratic — round work is Σ over nonzero pairs
(i,j) of deg(i)·deg(j), and the nonzero state approaches |V|² on
well-connected graphs.  This operator is exact and meant for
moderate-|V| graphs (quotient graphs, event-type graphs, ego-nets);
at corpus scale use ``min_score`` (drops pairs below the threshold
after each round — the standard truncated-SimRank approximation, an
explicit documented undercut) or a seed-restricted variant.  Fixed
``rounds`` keep the dataflow SQL-replayable for the driver value
check (``simrank_fixed``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def simrank(
    edges: DataFrame,
    rounds: int = 5,
    importance_factor: float = 0.9,
    neighbors: str = "in",
    min_score: float | None = None,
) -> DataFrame:
    """``(a, b, similarity)`` for all ordered vertex pairs with a
    nonzero score after ``rounds`` iterations from the identity start
    (both orientations emitted; the matrix is symmetric).

    ``neighbors="in"`` scores by shared in-neighborhoods (the paper's
    definition); ``"out"`` by out-neighborhoods (what networkx's
    DiGraph scoring does).  ``min_score`` prunes pairs below the
    threshold after each round (exact when None).
    """
    if neighbors not in ("in", "out"):
        raise ValueError(f"neighbors must be 'in' or 'out', got {neighbors!r}")
    c = float(importance_factor)
    e = edges.select("src", "dst").distinct()
    if neighbors == "out":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    e = e.persist()
    # I(a) = {i : (i, a) ∈ e}; deg = |I(a)|
    deg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    ).persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    state = verts.select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.lit(1.0).alias("s")
    ).transform(flat_checkpoint)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("na"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("nb"))
    for _ in range(rounds):
        gathered = (
            state.join(e1, state["a"] == e1["a"]).drop(state["a"])
            .join(e2, state["b"] == e2["b"]).drop(state["b"])
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.sum("s").alias("acc"))
        )
        off = (
            gathered.where(F.col("a") != F.col("b"))
            .join(deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a")
            .join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("acc") / (F.col("da") * F.col("db"))).alias("s"),
            )
        )
        if min_score is not None:
            off = off.where(F.col("s") >= min_score)
        state = (
            off.unionByName(
                verts.select(
                    F.col("id").alias("a"),
                    F.col("id").alias("b"),
                    F.lit(1.0).alias("s"),
                )
            )
            .transform(flat_checkpoint)
        )
    out = state.select("a", "b", F.col("s").alias("similarity")).localCheckpoint()
    e.unpersist()
    deg.unpersist()
    verts.unpersist()
    return out
