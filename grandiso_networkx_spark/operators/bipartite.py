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
