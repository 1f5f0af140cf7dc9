"""Exact triangle counting by degree-ordered orientation.

North-rule op (SURVEY.md §2.6).  Standard two-join Spark formulation:
orient every undirected edge from its lower-(degree, id) endpoint to
the higher one — the resulting DAG has max out-degree O(sqrt(m)) —
then close wedges:

    oriented e1(a,b) ⋈ oriented e2(b,c) ⋈ oriented e3(a,c)

Each triangle appears exactly once.  The orientation is what makes this
survive hub skew at scale: a 10^8-degree hub contributes only its
*higher-ordered* neighbors as out-edges, so the wedge join never
explodes on it.

Cross-check (exercised in tests): grandiso's K3 motif count equals
6 × this count (automorphism factor — /root/reference/grandiso/
test_grandiso.py:191-204, :364-371), and ``sum(nx.triangles)/3``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import symmetrize


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical undirected edges oriented by (degree, id), loops dropped."""
    und = symmetrize(edges).where(F.col("src") != F.col("dst"))
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    e = (
        und.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    keep = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return e.where(keep).select("src", "dst")


def triangles(edges: DataFrame) -> DataFrame:
    """One row ``(a, b, c)`` per distinct triangle (orientation order)."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    tris = wedges.join(e3, ["a", "c"], "left_semi").select("a", "b", "c")
    return tris


def triangle_count(edges: DataFrame) -> int:
    return triangles(edges).count()


def per_vertex_triangles(edges: DataFrame) -> DataFrame:
    """``(id, tri_count)`` — matches ``nx.triangles`` per vertex."""
    t = triangles(edges)
    stacked = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    return stacked.groupBy("id").agg(F.count(F.lit(1)).alias("tri_count"))


def edge_embeddedness(edges: DataFrame) -> DataFrame:
    """Per-edge embeddedness ``(src, dst, common_neighbors)`` — the
    number of triangles each undirected edge participates in (= common
    neighbors of its endpoints), a classic tie-strength / spam-edge
    signal.  Edges are reported once in canonical ``src < dst`` order;
    edges in no triangle report 0.

    Same skew story as :func:`triangles`: common neighbors are found
    by joining the *degree-oriented* wedge set, so hub pairs never
    enumerate a hub's full neighborhood — the wedge count is bounded
    by m^(3/2) total regardless of skew.
    """
    t = triangles(edges)
    # Every triangle (a,b,c) contributes 1 to each of its three edges.
    tri_edges = (
        t.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(t.select(F.col("a").alias("x"), F.col("c").alias("y")))
        .unionAll(t.select(F.col("b").alias("x"), F.col("c").alias("y")))
    )
    canon_tri = tri_edges.select(
        F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst")
    )
    counts = canon_tri.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("common_neighbors")
    )
    all_edges = (
        symmetrize(edges)
        .where(F.col("src") < F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return (
        all_edges.join(counts, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.coalesce("common_neighbors", F.lit(0)).alias(
                "common_neighbors"
            ),
        )
    )


def triangle_count_sampled(
    edges: DataFrame,
    keep: int,
    mod: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """DOULION (Tsourakakis et al., KDD'09) sampled triangle estimate:
    one row ``(n_sampled, estimate)``.

    Each canonical undirected edge survives with probability
    ``p = keep/mod`` decided by the portable 60-bit md5 hash of
    ``min|max|seed`` — deterministic under any partitioning/retry and
    bit-replayable in SQL — then the exact oriented count runs on the
    sparsified graph and extrapolates by ``1/p^3`` (each triangle
    survives iff all three edges do).  This is the 100-TB path when
    the exact count's Σ deg(out)² wedge work is too hot: sampling
    shrinks the edge set BEFORE the two wedge joins, so the whole
    pipeline cost scales by ~p² while the estimator stays unbiased.
    """
    from ..functions.hashing import hash60_keyed

    if not (0 < keep <= mod):
        raise ValueError("need 0 < keep <= mod")
    und = (
        symmetrize(edges)
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    draw = F.pmod(
        hash60_keyed(
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.lit(str(seed)),
        ),
        F.lit(mod),
    )
    sampled = und.where(draw < F.lit(keep))
    p = keep / mod
    return (
        triangles(sampled)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .select(
            "n_sampled",
            F.round(F.col("n_sampled") / F.lit(p**3), 6).alias("estimate"),
        )
    )
