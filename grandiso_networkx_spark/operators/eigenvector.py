"""Eigenvector centrality (link-analysis op beside PageRank/Katz/HITS
— not in the reference; SURVEY.md §2.6 class).

Matches ``networkx.eigenvector_centrality`` exactly (the (A+I) power
iteration on the left eigenvector):

    y_i   = x_{i-1} + A^T x_{i-1}          (x[dst] += x[src] * w)
    x_i   = y_i / ||y_i||_2                (zero norm degrades to 1)
    start:  x_0 = nstart / sum(nstart)     (default all-1 -> 1/n each)
    stop:   sum_v |x_i(v) - x_{i-1}(v)| < N * tol
    else    RuntimeError after max_iter (nx's
            PowerIterationFailedConvergence).

Spark shape — the engine's standard gather loop: one
edges-join-state + ``groupBy(dst).sum`` per round (map-side combine
absorbs hub in-degree skew before the exchange), a left join against
the vertex frame re-adds vertices with no in-edges (they keep their
identity term), and the L2 norm is a driver scalar folded into the
next round's plan as a literal — exactly the HITS 1/max-scaling shape,
so the hot loop stays two shuffles per round regardless of graph
size.  ``fixed_iterations`` runs exactly that many rounds with no
convergence agg — the SQL-expressible mode the driver value-checks
via an unrolled CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def eigenvector_centrality(
    edges: DataFrame,
    max_iter: int = 100,
    tol: float = 1e-6,
    weight_col: str | None = None,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Eigenvector centrality over a directed edge DataFrame
    ``(src, dst [, weight])``; contributions flow along stored edge
    direction (``x[dst] += x[src] * w``, networkx's left eigenvector).
    Undirected semantics = pass a symmetrized edge table, exactly as
    networkx sees an ``nx.Graph``'s two stored directions.

    Returns ``(id, eigenvector double)``.  Raises ``RuntimeError`` when
    convergence-mode fails within ``max_iter`` (mirroring
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
        return edges.sparkSession.createDataFrame(
            [], "id string, eigenvector double"
        )

    x = verts.select("vid", F.lit(1.0 / n).alias("x")).localCheckpoint()
    converged = fixed_iterations is not None
    for _ in range(max_iter):
        gathered = (
            e.join(x.withColumnRenamed("vid", "src"), "src")
            .select("dst", (F.col("x") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("g"))
        )
        # y = x + gather; then normalize by the driver-collected L2
        # norm (one scalar per round, folded into the next plan).
        y = (
            x.join(gathered, x["vid"] == gathered["dst"], "left")
            .select(
                "vid",
                (F.col("x") + F.coalesce("g", F.lit(0.0))).alias("y"),
            )
            .transform(flat_checkpoint)
        )
        norm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y")))).collect()[0][0]
        x_new = y.select(
            "vid", (F.col("y") / F.lit(norm or 1.0)).alias("x")
        ).transform(flat_checkpoint)
        if fixed_iterations is None:
            err = (
                x_new.join(x.withColumnRenamed("x", "xlast"), "vid")
                .agg(F.sum(F.abs(F.col("x") - F.col("xlast"))))
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
        raise RuntimeError(
            f"Eigenvector centrality failed to converge in {max_iter} "
            "iterations."
        )
    return x.select(F.col("vid").alias("id"), F.col("x").alias("eigenvector"))
