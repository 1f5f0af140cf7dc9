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


def four_profile(edges: DataFrame) -> DataFrame:
    """Exact connected 4-vertex graphlet profile — one row with the
    INDUCED counts ``(p4, claw, c4, paw, diamond, k4)`` (path, star,
    cycle, tailed triangle, chorded cycle, clique).

    Everything except K4 comes from closed-form aggregates over the
    degree table, per-vertex/per-edge triangle counts, and the
    all-pairs common-neighbor table (wedge self-join, Σ deg² work) —
    no 4-way enumeration:

    - non-induced  claw    = Σ_v C(d_v, 3)
    - non-induced  paw     = Σ_v t(v)·(d_v − 2)
    - non-induced  p4      = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·T
    - non-induced  diamond = Σ_{(u,v)∈E} C(cn(u,v), 2)
    - non-induced  c4      = ½ Σ_{u<v} C(cn(u,v), 2)  (all pairs —
      each 4-cycle is seen once from each of its 2 diagonals)
    - K4 counts (triangle, 4th-vertex) incidences / 4 — the one
      enumeration, bounded by Σ_tri deg and shared with the motif
      engine's clique path at scale.

    Induced counts then follow from the inclusion–exclusion matrix
    (computed programmatically from subgraph multiplicities and
    pinned by the brute-force pytest differential):

        i_p4      = p4 − 4·c4 − 2·paw + 6·diamond − 12·k4
        i_claw    = claw − paw + 2·diamond − 4·k4
        i_c4      = c4 − diamond + 3·k4
        i_paw     = paw − 4·diamond + 12·k4
        i_diamond = diamond − 6·k4
        i_k4      = k4
    """
    und = (
        symmetrize(edges)
        .where(F.col("src") != F.col("dst"))
        .persist()
    )
    can = und.where(F.col("src") < F.col("dst"))
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    ).persist()
    tri = triangles(edges).persist()

    T = tri.count()
    tv = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    claw_paw = (
        deg.join(tv, "id", "left")
        .agg(
            F.sum(
                F.col("d") * (F.col("d") - 1) * (F.col("d") - 2) / F.lit(6.0)
            ).alias("claw"),
            F.sum(
                F.coalesce("t", F.lit(0)) * (F.col("d") - 2)
            ).alias("paw"),
        )
    )
    p4 = (
        can.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
        .agg(
            (
                F.sum((F.col("du") - 1) * (F.col("dv") - 1)) - F.lit(3 * T)
            ).alias("p4")
        )
    )
    # all-pairs common neighbors (pairs meeting through >=1 wedge)
    cn = (
        und.select(F.col("src").alias("a"), F.col("dst").alias("w"))
        .join(und.select(F.col("src").alias("b"), F.col("dst").alias("w")), "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
        .persist()
    )
    c4 = cn.agg(
        (F.sum(F.col("cn") * (F.col("cn") - 1) / F.lit(2.0)) / F.lit(2.0)).alias("c4")
    )
    diamond = (
        cn.join(can.withColumnRenamed("src", "a").withColumnRenamed("dst", "b"),
                ["a", "b"], "left_semi")
        .agg(F.sum(F.col("cn") * (F.col("cn") - 1) / F.lit(2.0)).alias("diamond"))
    )
    # K4: (oriented triangle, 4th vertex adjacent to all three) / 4
    adj = und.select(F.col("src").alias("x"), F.col("dst").alias("dd"))
    k4 = (
        tri.join(adj.withColumnRenamed("x", "a"), "a")
        .join(
            und.select(F.col("src").alias("b"), F.col("dst").alias("dd")),
            ["b", "dd"],
            "left_semi",
        )
        .join(
            und.select(F.col("src").alias("c"), F.col("dst").alias("dd")),
            ["c", "dd"],
            "left_semi",
        )
        .agg((F.count(F.lit(1)) / F.lit(4.0)).alias("k4"))
    )
    out = (
        claw_paw.crossJoin(p4)
        .crossJoin(c4)
        .crossJoin(diamond)
        .crossJoin(k4)
        .select(
            *[F.coalesce(F.col(c), F.lit(0.0)).alias(c)
              for c in ("p4", "claw", "c4", "paw", "diamond", "k4")]
        )
        .select(
            (
                F.col("p4") - 4 * F.col("c4") - 2 * F.col("paw")
                + 6 * F.col("diamond") - 12 * F.col("k4")
            ).cast("long").alias("p4"),
            (
                F.col("claw") - F.col("paw") + 2 * F.col("diamond")
                - 4 * F.col("k4")
            ).cast("long").alias("claw"),
            (F.col("c4") - F.col("diamond") + 3 * F.col("k4"))
            .cast("long").alias("c4"),
            (F.col("paw") - 4 * F.col("diamond") + 12 * F.col("k4"))
            .cast("long").alias("paw"),
            (F.col("diamond") - 6 * F.col("k4")).cast("long").alias("diamond"),
            F.col("k4").cast("long").alias("k4"),
        )
    )
    # materialize before unpersisting the inputs it reads
    rows = out.collect()
    for frame in (und, deg, tri, cn):
        frame.unpersist()
    return edges.sparkSession.createDataFrame(
        rows, "p4 long, claw long, c4 long, paw long, diamond long, k4 long"
    )
