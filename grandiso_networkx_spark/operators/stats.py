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


def attribute_assortativity(
    edges: DataFrame,
    attrs: DataFrame,
    directed: bool = False,
) -> DataFrame:
    """Categorical attribute assortativity as a 1-row
    ``(attr_assortativity double)`` frame —
    ``nx.attribute_assortativity_coefficient`` semantics:

        r = (Σ_i e_ii − Σ_i a_i·b_i) / (1 − Σ_i a_i·b_i)

    over the normalized category mixing matrix ``e`` of edge endpoints
    (undirected: both orientations of every edge; directed: stored
    orientation, ``a``/``b`` = out/in margins).  ``attrs (id, cat)``
    must cover every endpoint (edges touching unlabeled vertices are
    dropped by the inner joins — networkx raises there instead);
    degenerate single-category graphs return null (nx returns nan).

    Scale shape: two label-attach equi joins, then every aggregate is
    keyed by category (cardinality = #distinct labels, tiny) — the
    Σ a_i·b_i term is a category⋈category join, never per-vertex.
    """
    # distinct() on the directed path for simple-digraph semantics —
    # symmetrize() already dedups on the undirected path
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    if not directed:
        e = symmetrize(e)
    pairs = (
        e.join(
            attrs.select(F.col("id").alias("src"), F.col("cat").alias("ca")),
            "src",
        )
        .join(
            attrs.select(F.col("id").alias("dst"), F.col("cat").alias("cb")),
            "dst",
        )
        .select("ca", "cb")
    )
    tot = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(
            F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)
        ).cast("double").alias("diag"),
    )
    a = pairs.groupBy(F.col("ca").alias("cat")).agg(
        F.count(F.lit(1)).cast("double").alias("na")
    )
    b = pairs.groupBy(F.col("cb").alias("cat")).agg(
        F.count(F.lit(1)).cast("double").alias("nb")
    )
    ab = (
        a.join(b, "cat")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("sab"))
    )
    return (
        tot.crossJoin(ab)
        .select(
            (F.col("diag") / F.col("m")).alias("tr"),
            (F.col("sab") / (F.col("m") * F.col("m"))).alias("ab"),
        )
        .select(
            F.when(
                F.col("ab") < 1.0,
                (F.col("tr") - F.col("ab")) / (1.0 - F.col("ab")),
            ).alias("attr_assortativity")
        )
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Overall reciprocity of the directed simple graph as a 1-row
    ``(reciprocity double)`` frame — ``nx.overall_reciprocity``
    semantics: the fraction of (distinct, non-loop) directed edges
    whose reverse edge also exists; null on an empty edge set (nx
    raises there).

    One self-semi-join on the swapped key + two counts — the
    reciprocated check is an equi join on (dst, src), fully
    shuffled-hash-joinable at any scale."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    counts = e.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).alias("recip")
    )
    total = e.agg(F.count(F.lit(1)).alias("m"))
    return counts.crossJoin(total).select(
        F.when(
            F.col("m") > 0, F.col("recip") / F.col("m")
        ).alias("reciprocity")
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """Non-normalized rich-club coefficient for every degree threshold:
    ``(k, n_nodes, n_edges, rich_club)`` with ``rich_club = 2·E_k /
    (N_k·(N_k−1))`` where ``N_k`` = vertices of degree > k and ``E_k``
    = undirected edges both of whose endpoints have degree > k —
    ``nx.rich_club_coefficient(G, normalized=False)`` semantics
    (rows only for k with ``N_k ≥ 2``, k from 0 to max_degree−1).

    Scale shape: the full curve comes from TWO histograms and suffix
    sums — never a per-k pass.  ``N_k`` is a suffix-cumulative of the
    degree histogram; ``E_k`` of the per-edge min-endpoint-degree
    histogram.  The only non-histogram work is attaching degrees to
    edges (two joins against the degree table, broadcastable when the
    vertex set allows, else shuffle-on-id like every other
    degree-annotated op).  The final windows run over the *distinct
    degree values* — hundreds of rows even at 100 TB — so the
    single-partition window is free.
    """
    from pyspark.sql import Window

    und = symmetrize(edges).where(F.col("src") != F.col("dst"))
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # Degree histogram -> N_k via suffix sum over degree values.
    dh = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nd"))
    # Canonical edges annotated with min endpoint degree -> E_k.
    canon = und.where(F.col("src") < F.col("dst"))
    ed = (
        canon.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddeg")), "dst")
        .select(F.least("sdeg", "ddeg").alias("mdeg"))
        .groupBy("mdeg")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    # Threshold domain: k = 0 .. max_deg - 1 (N_k >= 1 there).
    ks = dh.agg(F.max("deg").alias("mx")).select(
        F.explode(F.sequence(F.lit(0), F.col("mx") - 1)).alias("k")
    )
    w = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nk = (
        ks.join(dh, ks.k + 1 == dh.deg, "left")
        .select("k", F.coalesce("nd", F.lit(0)).alias("nd"))
        .select("k", F.sum("nd").over(w).alias("n_nodes"))
    )
    ek = (
        ks.join(ed, ks.k + 1 == ed.mdeg, "left")
        .select("k", F.coalesce("ne", F.lit(0)).alias("ne"))
        .select("k", F.sum("ne").over(w).alias("n_edges"))
    )
    return (
        nk.join(ek, "k")
        .where(F.col("n_nodes") >= 2)
        .select(
            "k",
            "n_nodes",
            "n_edges",
            (
                2.0 * F.col("n_edges")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1))
            ).alias("rich_club"),
        )
    )


def avg_degree_connectivity(edges: DataFrame) -> DataFrame:
    """Average nearest-neighbor degree curve ``(deg, knn)`` —
    ``nx.average_degree_connectivity`` on the simple undirected graph:
    for each degree value k, the mean degree of all neighbors of all
    degree-k vertices.

    The per-degree companion to the single-number
    :func:`degree_assortativity` — a falling curve = hubs attach to
    leaves (disassortative), the shape diagnostic for hub-skew handling.

    Scale shape: degrees attach to the symmetrized edge list by two
    equi joins on the vertex id (shuffle-on-id, broadcastable when the
    degree table allows), then one map-side-combined
    ``groupBy(src_deg).avg(dst_deg)`` over distinct degree values —
    output rows = distinct degrees (hundreds at any scale).  No loop,
    no window, no collect.
    """
    sym = symmetrize(edges).where(F.col("src") != F.col("dst"))
    deg = _undirected_degrees(edges)
    return (
        sym.join(
            deg.select(F.col("id").alias("src"), F.col("deg").alias("sdeg")),
            "src",
        )
        .join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddeg")),
            "dst",
        )
        .groupBy(F.col("sdeg").alias("deg"))
        .agg(F.avg("ddeg").alias("knn"))
    )
