"""Whole-graph statistics (extra ops, beyond the north rule): degree
distribution, transitivity (global clustering), average local
clustering, degree assortativity.

All pure DataFrame aggregations over the degree table and the
triangle operator's outputs — one or two shuffles each, every one
SQL-expressible (DuckDB value checks in the driver contract) and
pinned against networkx oracles in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import symmetrize
from .triangles import per_vertex_triangles


def _undirected_degrees(edges: DataFrame) -> DataFrame:
    """(id, deg) over the simple undirected graph (self-loops dropped)."""
    sym = symmetrize(edges).where(F.col("src") != F.col("dst"))
    return sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """``(deg, n_vertices)`` histogram of undirected simple-graph
    degrees — the first diagnostic of hub skew."""
    return (
        _undirected_degrees(edges)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient ``3*triangles / open-or-closed
    wedges`` as a 1-row ``(transitivity double)`` frame —
    ``nx.transitivity`` semantics (0 when there are no wedges)."""
    tri_total = per_vertex_triangles(edges).agg(
        F.coalesce(F.sum("tri_count"), F.lit(0)).alias("t")
    )
    wedges = _undirected_degrees(edges).agg(
        F.coalesce(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2), F.lit(0.0)
        ).alias("w")
    )
    return tri_total.crossJoin(wedges).select(
        F.when(F.col("w") > 0, F.col("t") / F.col("w"))
        .otherwise(F.lit(0.0))
        .alias("transitivity")
    )


def avg_clustering(edges: DataFrame) -> DataFrame:
    """Average local clustering coefficient as a 1-row
    ``(avg_clustering double)`` frame — ``nx.average_clustering``
    semantics: vertices with degree < 2 contribute 0."""
    deg = _undirected_degrees(edges)
    tri = per_vertex_triangles(edges)
    per_v = deg.join(tri, "id", "left").select(
        F.when(
            F.col("deg") >= 2,
            2.0
            * F.coalesce("tri_count", F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("c")
    )
    return per_v.agg(F.coalesce(F.avg("c"), F.lit(0.0)).alias("avg_clustering"))


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient ``(id, clustering
    double)`` — ``nx.clustering`` semantics: ``2·tri(v) /
    (deg(v)·(deg(v)-1))``, 0 for degree < 2.  Every vertex of the
    simple undirected graph appears (isolated-after-self-loop-drop
    vertices are not in the degree table, matching the graph the other
    stats ops see).

    Scale shape: the triangle op's two-join closure plus ONE |V|-row
    left join against the degree table — per-vertex arithmetic is
    JVM-side column expressions, no shuffle beyond the triangle
    counting itself."""
    deg = _undirected_degrees(edges)
    tri = per_vertex_triangles(edges)
    return deg.join(tri, "id", "left").select(
        "id",
        F.when(
            F.col("deg") >= 2,
            2.0
            * F.coalesce("tri_count", F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Pearson degree assortativity of the undirected simple graph as a
    1-row ``(assortativity double)`` frame — ``nx.degree_pearson_
    correlation_coefficient`` semantics: the correlation of (deg(u),
    deg(v)) over both orientations of every edge."""
    sym = symmetrize(edges).where(F.col("src") != F.col("dst"))
    deg = _undirected_degrees(edges)
    pairs = (
        sym.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("deg", "deg_u")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("deg", "deg_v")
    )
    du = F.col("deg_u").cast("double")
    dv = F.col("deg_v").cast("double")
    # Guarded Pearson: built-in corr raises DIVIDE_BY_ZERO under ANSI
    # mode on zero-variance inputs (e.g. a regular graph); null there —
    # the undefined-correlation answer DuckDB/numpy also give.
    row = pairs.agg(
        F.covar_pop(du, dv).alias("cov"),
        F.stddev_pop(du).alias("s1"),
        F.stddev_pop(dv).alias("s2"),
    )
    return row.select(
        F.when(
            (F.col("s1") > 0) & (F.col("s2") > 0),
            F.col("cov") / (F.col("s1") * F.col("s2")),
        ).alias("assortativity")
    )
