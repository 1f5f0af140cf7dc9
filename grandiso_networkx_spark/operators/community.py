"""Partition quality metrics: modularity and per-community
conductance/volume/cut — the evaluation half of community detection
(the reference has no analytics at all; these score the output of
label_propagation / connected_components, matching
``networkx.algorithms.community.modularity`` semantics).

Input: ``edges (src, dst[, weight])`` where each row is ONE undirected
edge (stored orientation irrelevant); self-loops are dropped;
``labels (id, label)`` assigns every endpoint a community.

Scale shape: two equi joins attach the endpoint labels (shuffle keyed
by vertex id — labels is |V|-sized, never broadcast), then everything
reduces to ``groupBy(label)`` sums with map-side combine plus one
1-row global frame.  No UDFs, no collect beyond the optional scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _labeled_edges(
    edges: DataFrame, labels: DataFrame, weight_col: str | None
) -> DataFrame:
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.where(F.col("src") != F.col("dst")).select(
        "src", "dst", w.alias("w")
    )
    la = labels.select(
        F.col("id").alias("src"), F.col("label").alias("l_src")
    )
    lb = labels.select(
        F.col("id").alias("dst"), F.col("label").alias("l_dst")
    )
    return e.join(la, "src").join(lb, "dst")


def partition_quality(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-community ``(label, n_vertices, internal_w, cut_w, volume,
    conductance)`` over the undirected graph.

    - ``internal_w``: total weight of edges with both endpoints in the
      community;
    - ``cut_w``: total weight of edges with exactly one endpoint in it;
    - ``volume``: Σ weighted degree of members (= 2·internal + cut);
    - ``conductance``: ``cut / min(volume, total_volume - volume)``,
      null for the degenerate cases (empty or whole-graph community)
      where the denominator is 0.
    """
    le = _labeled_edges(edges, labels, weight_col)
    internal = (
        le.where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("label"))
        .agg(F.sum("w").alias("internal_w"))
    )
    # each cut edge contributes to BOTH sides' cut
    cut = (
        le.where(F.col("l_src") != F.col("l_dst"))
        .select(F.col("l_src").alias("label"), "w")
        .unionAll(
            le.where(F.col("l_src") != F.col("l_dst")).select(
                F.col("l_dst").alias("label"), "w"
            )
        )
        .groupBy("label")
        .agg(F.sum("w").alias("cut_w"))
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )
    per = (
        sizes.join(internal, "label", "left")
        .join(cut, "label", "left")
        .select(
            "label",
            "n_vertices",
            F.coalesce("internal_w", F.lit(0.0)).alias("internal_w"),
            F.coalesce("cut_w", F.lit(0.0)).alias("cut_w"),
        )
        .withColumn(
            "volume", 2 * F.col("internal_w") + F.col("cut_w")
        )
    )
    total = per.agg(F.sum("volume").alias("tv"))
    denom = F.least(F.col("volume"), F.col("tv") - F.col("volume"))
    return per.crossJoin(F.broadcast(total)).select(
        "label",
        "n_vertices",
        F.round("internal_w", 6).alias("internal_w"),
        F.round("cut_w", 6).alias("cut_w"),
        F.round("volume", 6).alias("volume"),
        F.round(
            F.when(denom > 0, F.col("cut_w") / denom), 6
        ).alias("conductance"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = None,
    resolution: float = 1.0,
) -> DataFrame:
    """Newman modularity of the partition as a 1-row DataFrame
    ``(modularity double)`` — exactly
    ``nx.algorithms.community.modularity``:

        Q = Σ_c [ internal_c / m  −  γ · (volume_c / 2m)² ]

    with ``m`` the total undirected edge weight.  Unrounded
    aggregates end-to-end (unlike :func:`partition_quality`'s
    display-rounded frame); one final round(6)."""
    le = _labeled_edges(edges, labels, weight_col)
    m = le.agg(F.sum("w")).collect()[0][0] or 0.0
    if m == 0:
        raise ValueError("modularity undefined for an empty edge set")
    internal = (
        le.where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("label"))
        .agg(F.sum("w").alias("iw"))
    )
    volume = (
        le.select(F.col("l_src").alias("label"), "w")
        .unionAll(le.select(F.col("l_dst").alias("label"), "w"))
        .groupBy("label")
        .agg(F.sum("w").alias("vol"))
    )
    return (
        volume.join(internal, "label", "left")
        .select(
            (
                F.coalesce("iw", F.lit(0.0)) / F.lit(m)
                - F.lit(resolution)
                * F.pow(F.col("vol") / F.lit(2 * m), 2)
            ).alias("q")
        )
        .agg(F.round(F.sum("q"), 6).alias("modularity"))
    )
