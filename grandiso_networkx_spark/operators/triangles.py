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
