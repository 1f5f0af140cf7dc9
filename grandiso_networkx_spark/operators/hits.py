"""HITS hubs/authorities (north-rule-adjacent link-analysis op — not
in the reference; sits beside PageRank in SURVEY.md §2.6).

Matches the classic networkx power-iteration recurrence
(``networkx.algorithms.link_analysis.hits_alg``) exactly:

    a_i(v) = sum over in-edges (u,v) of w(u,v) * h_{i-1}(u)
    h_i(u) = sum over out-edges (u,v) of w(u,v) * a_i(v)
    then h and a are each scaled by 1/max, err = L1(h_i - h_{i-1}),
    stop when err < tol; final vectors scaled by 1/sum when
    ``normalized`` (the networkx default).

Spark shape: the two half-steps of a round are each one
edges-join-state + ``groupBy().sum`` (map-side combine absorbs hub
skew exactly as in PageRank's gather), materialized with
``localCheckpoint`` for flat lineage; the 1/max scale factors are
driver literals folded into the NEXT consumer's plan, so scaling
never costs a pass of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hits(
    edges: DataFrame,
    max_iter: int = 100,
    tol: float = 1e-8,
    weight_col: str | None = None,
    fixed_iterations: int | None = None,
    normalized: bool = True,
) -> DataFrame:
    """HITS over a directed edge DataFrame ``(src, dst[, weight])``.

    Returns ``(id, hub double, authority double)``.  Raises
    ``RuntimeError`` if not converged within ``max_iter`` (mirroring
    ``nx.PowerIterationFailedConvergence``); ``fixed_iterations`` runs
    exactly that many rounds with no convergence test.
    """
    if fixed_iterations is not None:
        max_iter = fixed_iterations
    spark = edges.sparkSession
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w")).persist()

    verts = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        e.unpersist()
        verts.unpersist()
        return spark.createDataFrame([], "id string, hub double, authority double")

    # h state is (vid, h) — max-normalized per round, like networkx.
    h_frame = verts.select("vid", F.lit(1.0 / n).alias("h")).localCheckpoint()
    h_scale = 1.0
    a_frame = None
    a_scale = 1.0
    converged = fixed_iterations is not None
    for _ in range(max_iter):
        h_state = h_frame.select("vid", (F.col("h") * F.lit(h_scale)).alias("h"))
        a_raw = (
            e.join(h_state.withColumnRenamed("vid", "src"), "src")
            .select("dst", (F.col("h") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("a"))
        )
        a_frame_new = (
            verts.join(a_raw, verts["vid"] == a_raw["dst"], "left")
            .select("vid", F.coalesce("a", F.lit(0.0)).alias("a"))
            .localCheckpoint()
        )
        a_max = a_frame_new.agg(F.max("a")).collect()[0][0] or 1.0
        a_scale_new = 1.0 / a_max
        h_raw = (
            e.join(a_frame_new.withColumnRenamed("vid", "dst"), "dst")
            .select("src", (F.col("a") * F.col("w")).alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("h"))
        )
        h_frame_new = (
            verts.join(h_raw, verts["vid"] == h_raw["src"], "left")
            .select("vid", F.coalesce("h", F.lit(0.0)).alias("h"))
            .localCheckpoint()
        )
        if fixed_iterations is None:
            # The L1 delta needs the max-scaled new h, and the scale is
            # only known after the max agg — two tiny aggs over the
            # already-cached frame (no recompute).
            h_max = h_frame_new.agg(F.max("h")).collect()[0][0] or 1.0
            h_scale_new = 1.0 / h_max
            err = (
                h_frame_new.join(
                    h_state.withColumnRenamed("h", "hlast"), "vid"
                )
                .agg(
                    F.sum(
                        F.abs(F.col("h") * F.lit(h_scale_new) - F.col("hlast"))
                    )
                )
                .collect()[0][0]
            )
        else:
            h_max = h_frame_new.agg(F.max("h")).collect()[0][0] or 1.0
            h_scale_new = 1.0 / h_max
            err = None
        h_frame, h_scale = h_frame_new, h_scale_new
        a_frame, a_scale = a_frame_new, a_scale_new
        if err is not None and err < tol:
            converged = True
            break

    if not converged:
        e.unpersist()
        verts.unpersist()
        raise RuntimeError(f"HITS failed to converge in {max_iter} iterations.")

    out = (
        h_frame.select("vid", (F.col("h") * F.lit(h_scale)).alias("hub"))
        .join(
            a_frame.select(
                "vid", (F.col("a") * F.lit(a_scale)).alias("authority")
            ),
            "vid",
        )
    )
    if normalized:
        sums = out.agg(
            F.sum("hub").alias("sh"), F.sum("authority").alias("sa")
        ).collect()[0]
        sh = sums["sh"] or 1.0
        sa = sums["sa"] or 1.0
        out = out.select(
            "vid",
            (F.col("hub") / F.lit(sh)).alias("hub"),
            (F.col("authority") / F.lit(sa)).alias("authority"),
        )
    out = out.select(F.col("vid").alias("id"), "hub", "authority").localCheckpoint()
    e.unpersist()
    verts.unpersist()
    return out
