"""Bipartite projection: collapse a two-mode graph (user → item) into
a one-mode co-membership graph (user — user weighted by shared items)
— networkx ``bipartite.weighted_projected_graph`` semantics.

The transcript-derived invoke graph (role/user → tool/event-type) is
two-mode; most link-graph analytics want the projected one-mode graph
("which users behave alike"), which is what this produces.

Scale shape: the projection is a wedge self-join through the shared
right vertex — work is Σ_right deg², never |U|².  ``max_item_degree``
is the mandatory-at-scale hub guard: a right vertex shared by 10⁶
users contributes 10¹² pairs of weight-noise (everyone shares the
boilerplate item), so over-shared items are dropped BEFORE the
self-join, same discipline as linkpred's ``max_center_degree`` and
winnowing's stop-fingerprint ``max_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bipartite_project(
    edges: DataFrame,
    max_item_degree: int | None = 1000,
) -> DataFrame:
    """``(a, b, weight)`` — for left vertices ``a < b``, the number of
    distinct shared right vertices, over bipartite ``(src, dst)``
    edges (src = left mode, dst = right mode; duplicate rows collapse).

    Matches ``nx.bipartite.weighted_projected_graph`` on the guarded
    subgraph; with ``max_item_degree=None`` on the whole graph.
    """
    e = edges.select("src", "dst").distinct()
    if max_item_degree is not None:
        keep = (
            e.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_item_degree)
            .select("dst")
        )
        e = e.join(keep, "dst")
    a = e.select(F.col("src").alias("a"), "dst")
    b = e.select(F.col("src").alias("b"), "dst")
    return (
        a.join(b, "dst")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def bipartite_clustering(
    edges: DataFrame,
    side: str = "left",
    mode: str = "dot",
    max_item_degree: int | None = None,
) -> DataFrame:
    """Latapy bipartite clustering coefficient ``(id, clustering)``
    for every vertex of ``side`` ("left" = src, "right" = dst) —
    ``networkx.algorithms.bipartite.clustering`` semantics:

        cc_mode(u,v): "dot" = |N(u)∩N(v)| / |N(u)∪N(v)|   (Jaccard)
                      "min" = |N(u)∩N(v)| / min(|N(u)|,|N(v)|)
                      "max" = |N(u)∩N(v)| / max(|N(u)|,|N(v)|)
        cc(u) = mean of cc_mode(u,v) over u's second-order neighbors v

    (0.0 when u has no second-order neighbors, matching networkx).

    Scale shape: one wedge self-join through the opposite side
    (Σ deg² there) + one ``groupBy`` mean — the same pair-count pass
    as :func:`bipartite_project`, with the same optional
    ``max_item_degree`` hub guard on the wedge side (exact when no
    wedge-side vertex exceeds the cap).
    """
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    if mode not in ("dot", "min", "max"):
        raise ValueError(f"mode must be dot|min|max, got {mode!r}")
    e = edges.select("src", "dst").distinct()
    a, k = ("src", "dst") if side == "left" else ("dst", "src")
    if max_item_degree is not None:
        keep = (
            e.groupBy(k)
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_item_degree)
            .select(k)
        )
        e = e.join(keep, k)
    e = e.persist()
    deg = e.groupBy(a).agg(F.count(F.lit(1)).alias("d"))
    pairs = (
        e.select(F.col(a).alias("u"), F.col(k).alias("k"))
        .join(e.select(F.col(a).alias("v"), F.col(k).alias("k")), "k")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .join(deg.select(F.col(a).alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col(a).alias("v"), F.col("d").alias("dv")), "v")
    )
    cc = {
        "dot": F.col("w") / (F.col("du") + F.col("dv") - F.col("w")),
        "min": F.col("w") / F.least("du", "dv"),
        "max": F.col("w") / F.greatest("du", "dv"),
    }[mode]
    per = pairs.groupBy(F.col("u").alias("id")).agg(
        F.avg(cc).alias("clustering")
    )
    verts = e.select(F.col(a).alias("id")).distinct()
    out = verts.join(per, "id", "left").select(
        "id", F.coalesce("clustering", F.lit(0.0)).alias("clustering")
    )
    res = out.localCheckpoint()
    e.unpersist()
    return res
