"""Neighborhood-overlap link-prediction scores: common neighbors,
Jaccard coefficient, Adamic–Adar, resource allocation, preferential
attachment.

Link-graph analytics op alongside SURVEY.md §2.6 (not in the reference;
semantics oracles are ``networkx.jaccard_coefficient`` /
``networkx.adamic_adar_index`` / ``networkx.resource_allocation_index``
/ ``networkx.preferential_attachment`` evaluated on the same pairs).

Semantics: undirected simple graph (orientation ignored, self-loops
dropped).  For every unordered vertex pair (u, v), u < v, with at least
``min_common`` shared neighbors:

- ``common``      = |Γ(u) ∩ Γ(v)|
- ``jaccard``     = common / |Γ(u) ∪ Γ(v)|
- ``adamic_adar`` = Σ_{w ∈ Γ(u) ∩ Γ(v)} 1 / ln(deg(w))
- ``resource_allocation`` = Σ_{w ∈ Γ(u) ∩ Γ(v)} 1 / deg(w)
- ``pref_attachment``     = deg(u) · deg(v)

Scale shape: candidate pairs are generated ONLY by the wedge self-join
(two copies of the adjacency meeting on the shared center w), so the
work is Σ_w deg(w)² — never the |V|² cross product.  That sum is
hub-dominated: one 10^6-degree center alone contributes 10^12 wedges,
so ``max_center_degree`` drops ultra-hub centers before the join (the
same max-df escape hatch as winnowing's stop-fingerprint guard —
documented precision loss for scores THROUGH a dropped hub, bounded
work).  The remaining aggregation is a single ``groupBy(u, v)`` with
map-side partial aggregation; degrees ride in as a broadcast-able
(|V|-row) join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import symmetrize


def link_prediction_scores(
    edges: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """``(u, v, common long, jaccard double, adamic_adar double,
    resource_allocation double, pref_attachment long)`` for every
    unordered pair (u < v) sharing >= ``min_common`` neighbors.

    ``max_center_degree``: skip wedge centers with degree above this
    bound (hub guard; None = exact).
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    sym = symmetrize(edges.where(F.col("src") != F.col("dst")))
    # (center w, endpoint n) adjacency + center degree.
    adj = sym.select(F.col("src").alias("w"), F.col("dst").alias("n"))
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj.join(deg, "w")
    if max_center_degree is not None:
        centers = centers.where(F.col("deg") <= max_center_degree)
    a = centers.select("w", F.col("n").alias("u"))
    # deg-1 centers can never close a wedge (u < v needs two distinct
    # neighbors) but the expression is evaluated before the pair filter,
    # and 1/ln(1) is a division by zero under ANSI mode — guard it.
    b = centers.select(
        "w",
        F.col("n").alias("v"),
        F.when(F.col("deg") > 1, 1.0 / F.log(F.col("deg")))
        .otherwise(F.lit(0.0))
        .alias("inv_ln_deg"),
        (1.0 / F.col("deg")).alias("inv_deg"),
    )
    pairs = (
        a.join(b, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("inv_ln_deg").alias("adamic_adar"),
            F.sum("inv_deg").alias("resource_allocation"),
        )
        .where(F.col("common") >= min_common)
    )
    # |Γu ∪ Γv| = deg(u) + deg(v) − common; endpoint degrees are a
    # |V|-row dimension join (broadcast-able).
    du = deg.select(F.col("w").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("dv"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common") / (F.col("du") + F.col("dv") - F.col("common"))
            ).alias("jaccard"),
            "adamic_adar",
            "resource_allocation",
            (F.col("du") * F.col("dv")).alias("pref_attachment"),
        )
    )
