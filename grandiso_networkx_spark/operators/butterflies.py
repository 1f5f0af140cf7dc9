"""Exact butterfly (bipartite 4-cycle) counting.

The butterfly — two left vertices sharing two right vertices — is the
smallest non-trivial motif of a bipartite graph and the bipartite
analogue of the triangle (Sanei-Mehri, Sariyüce & Tirthapura, KDD'18);
on this engine's user↔event-type invoke graph it counts pairs of users
with two shared event types, the co-engagement primitive behind
bipartite clustering coefficients and peeling (k-wing) decompositions.

Counting identity: if two left vertices u,v share ``w`` right
neighbors, they close ``C(w,2)`` butterflies, so

    #butterflies = Σ over left pairs (u,v): C(w_uv, 2)

and symmetrically over right pairs — both sides give the same total,
which is the cross-check the tests pin.

Scale shape: wedge-join work pairing through side S is
``Σ_{x∈S̄} deg(x)²`` (each opposite-side vertex emits its neighbor
pairs), so :func:`butterfly_count` picks the cheaper pairing side with
two 1-row degree aggregates first — the standard exact-count strategy
(ibid. §4).  Everything is distinct-edge equi joins + ``groupBy``
sums with map-side combine; per-pair wedge counts ``w`` stay grouped
(never exploded into C(w,2) rows).  A super-hub on the wedge side
still costs deg² through that hub: callers with power-law sides cap it
with ``max_wedge_degree`` (drops wedges THROUGH right vertices above
the cap — an explicit, documented undercount, exact when no vertex
exceeds the cap; same guard discipline as linkpred's hub guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _support(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").distinct()


def _pair_counts(
    e: DataFrame, through_right: bool, max_wedge_degree: int | None
) -> DataFrame:
    """``(u, v, w)``: same-side vertex pairs (u < v as strings) with
    their shared-neighbor count ``w``, paired through the opposite
    side."""
    a, b = ("src", "dst") if through_right else ("dst", "src")
    # wedge hub side = b; optionally cap its degree
    if max_wedge_degree is not None:
        ok = (
            e.groupBy(b)
            .agg(F.count(F.lit(1)).alias("__d"))
            .where(F.col("__d") <= max_wedge_degree)
            .select(b)
        )
        e = e.join(ok, b, "left_semi")
    l = e.select(F.col(a).alias("u"), F.col(b).alias("k"))
    r = e.select(F.col(a).alias("v"), F.col(b).alias("k"))
    return (
        l.join(r, "k")
        .where(F.col("u").cast("string") < F.col("v").cast("string"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def butterfly_count(
    edges: DataFrame, max_wedge_degree: int | None = None
) -> DataFrame:
    """One row ``(butterflies long, wedge_side string)`` — the exact
    global butterfly count of the bipartite graph ``(src=left,
    dst=right)``, pairing through whichever side makes the wedge join
    cheaper (Σ deg² decided by two tiny aggregates)."""
    e = _support(edges).persist()
    cost = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d")).agg(
        F.sum(F.col("d") * F.col("d"))
    ).collect()[0][0] or 0
    cost_l = e.groupBy("src").agg(F.count(F.lit(1)).alias("d")).agg(
        F.sum(F.col("d") * F.col("d"))
    ).collect()[0][0] or 0
    through_right = cost <= cost_l  # pair left vertices via right side
    out = (
        _pair_counts(e, through_right, max_wedge_degree)
        .agg(
            F.coalesce(
                F.sum(F.col("w") * (F.col("w") - 1) / 2), F.lit(0.0)
            )
            .cast("long")
            .alias("butterflies")
        )
        .select(
            "butterflies",
            F.lit("right" if through_right else "left").alias("wedge_side"),
        )
    )
    rows_done = out.localCheckpoint()
    e.unpersist()
    return rows_done


def butterfly_per_vertex(
    edges: DataFrame,
    side: str = "left",
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """``(id, butterflies long)`` — butterflies containing each vertex
    of ``side`` ("left" = src column, "right" = dst).  A vertex u on
    the counted side participates in Σ_v C(w_uv, 2) butterflies; the
    pairing runs through the opposite side."""
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    e = _support(edges).persist()
    pairs = _pair_counts(e, side == "left", max_wedge_degree)
    contrib = (F.col("w") * (F.col("w") - 1) / 2).alias("b")
    stacked = pairs.select(F.col("u").alias("id"), contrib).unionAll(
        pairs.select(F.col("v").alias("id"), contrib)
    )
    col = "src" if side == "left" else "dst"
    verts = e.select(F.col(col).alias("id")).distinct()
    out = (
        verts.join(
            stacked.groupBy("id").agg(F.sum("b").alias("b")), "id", "left"
        )
        .select(
            "id",
            F.coalesce("b", F.lit(0.0)).cast("long").alias("butterflies"),
        )
        .localCheckpoint()
    )
    e.unpersist()
    return out
