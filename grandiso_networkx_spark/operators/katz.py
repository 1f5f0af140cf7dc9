"""Katz centrality (link-analysis op beside PageRank/HITS — not in the
reference; SURVEY.md §2.6 class).

Matches ``networkx.katz_centrality`` exactly:

    x_i(v) = alpha * sum over in-edges (u,v) of w(u,v) * x_{i-1}(u) + beta
    starting from x_0 = 0, L1 convergence test ``err < N * tol``, then a
    final 1/sqrt(sum x^2) normalization when ``normalized`` (the
    networkx default; zero norm degrades to scale 1).

Spark shape — identical to the engine's other gather loops: one
edges-join-state + ``groupBy(dst).sum`` per round (map-side combine
absorbs hub in-degree skew before the exchange) and a
``localCheckpoint`` per round for flat lineage.  The state frame is
verts-complete, so it is BOTH the update-join spine (re-adding
vertices with no in-edges) and the free carrier of the previous
iterate — the HITS carried-state pattern (``operators/hits.py``):
convergence mode's L1 delta is ONE cheap agg over the just-
materialized frame (no re-join of consecutive iterates, no second
shuffle), so the loop body is 1 materialization + 1 scalar agg per
round (fixed mode: 1 + 0), pinned by the job-count gate in
tests/test_eigen_katz_jobs.py.  ``fixed_iterations`` runs exactly
that many rounds with no convergence agg — the SQL-expressible mode
the driver value-checks via an unrolled CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-6,
    weight_col: str | None = None,
    normalized: bool = True,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Katz centrality over a directed edge DataFrame ``(src, dst
    [, weight])``; contributions flow along stored edge direction
    (``x[dst] += x[src] * w``, as in networkx).

    Returns ``(id, katz double)``.  Raises ``RuntimeError`` if not
    converged within ``max_iter`` (mirroring
    ``nx.PowerIterationFailedConvergence``).
    """
    if fixed_iterations is not None:
        max_iter = fixed_iterations
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
        return edges.sparkSession.createDataFrame([], "id string, katz double")

    x = verts.select("vid", F.lit(0.0).alias("x")).localCheckpoint()
    converged = fixed_iterations is not None
    for _ in range(max_iter):
        gathered = (
            e.join(x.withColumnRenamed("vid", "src"), "src")
            .select("dst", (F.col("x") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("g"))
        )
        # x is verts-complete, so it is BOTH the update-join spine and
        # the free carrier of xlast for the L1 delta.
        x_new = (
            x.join(gathered, x["vid"] == gathered["dst"], "left")
            .select(
                x["vid"],
                (
                    F.lit(alpha) * F.coalesce("g", F.lit(0.0)) + F.lit(beta)
                ).alias("x"),
                x["x"].alias("xlast"),
            )
            .transform(flat_checkpoint)
        )
        if fixed_iterations is None:
            # ONE cheap agg over the just-materialized frame — never a
            # re-join of consecutive iterates.
            err = (
                x_new.agg(F.sum(F.abs(F.col("x") - F.col("xlast"))))
                .collect()[0][0]
            )
            if err < n * tol:
                x = x_new
                converged = True
                break
        x = x_new

    e.unpersist()
    verts.unpersist()
    if not converged:
        raise RuntimeError(f"Katz failed to converge in {max_iter} iterations.")

    if normalized:
        norm = x.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).collect()[0][0]
        x = x.select("vid", (F.col("x") / F.lit(norm or 1.0)).alias("x"))
    return x.select(F.col("vid").alias("id"), F.col("x").alias("katz"))
