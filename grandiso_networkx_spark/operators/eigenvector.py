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
absorbs hub in-degree skew before the exchange); the state frame is
verts-complete, so it is BOTH the update-join spine (re-adding
vertices with no in-edges, which keep their identity term) and the
free carrier of the previous iterate for the L1 delta — the HITS
carried-literal pattern (``operators/hits.py``).  Driver serial cost
per round (the fraction the N->4N scaling legs feel hardest):

- convergence mode: ONE materialization + ONE combined agg that
  returns the L2 norm AND the L1 delta together (the 1/norm needed
  inside the delta is a broadcast 1-row subquery over the SAME
  materialized frame, not a separate driver job); the norm is then
  folded into the next round's plan as a literal.
- fixed mode: ONE materialization + ZERO driver collects — the
  per-round normalization divides by an in-plan broadcast 1-row norm
  subquery over the cached frame (the broadcast materialization is
  still one Spark job, but no driver round-trip sits on the serial
  path; the division itself must stay per-round: it is nx's
  recurrence and the value-checked oracle unrolls it).

Down from 4 (norm collect + two checkpoints + err join-agg) / 3
jobs per round; pinned by the job-count gate in
tests/test_eigen_katz_jobs.py.  ``fixed_iterations`` runs exactly
that many rounds with no convergence agg — the SQL-expressible mode
the driver value-checks via an unrolled CTE chain.
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
    # zero-norm guard (nx: zero norm degrades to scale 1)
    norm_expr = F.coalesce(
        F.nullif(F.sqrt(F.sum(F.col("y") * F.col("y"))), F.lit(0.0)),
        F.lit(1.0),
    )
    for _ in range(max_iter):
        gathered = (
            e.join(x.withColumnRenamed("vid", "src"), "src")
            .select("dst", (F.col("x") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("g"))
        )
        # y = x + gather; x is verts-complete, so it is BOTH the
        # update-join spine and the free carrier of xlast for the L1
        # delta — ONE materialization per round.
        y = (
            x.join(gathered, x["vid"] == gathered["dst"], "left")
            .select(
                x["vid"],
                (F.col("x") + F.coalesce("g", F.lit(0.0))).alias("y"),
                x["x"].alias("xlast"),
            )
            .transform(flat_checkpoint)
        )
        nr = y.agg(norm_expr.alias("__nr"))
        if fixed_iterations is None:
            # ONE combined agg: the L2 norm AND the L1 delta against
            # the previous normalized x — the 1/norm inside the delta
            # is a broadcast 1-row subquery over the SAME materialized
            # frame (no recompute, no second driver job).
            row = (
                y.crossJoin(F.broadcast(nr))
                .agg(
                    F.max("__nr").alias("nr"),
                    F.sum(
                        F.abs(F.col("y") / F.col("__nr") - F.col("xlast"))
                    ).alias("err"),
                )
                .collect()[0]
            )
            x = y.select("vid", (F.col("y") / F.lit(row["nr"])).alias("x"))
            if row["err"] < n * tol:
                converged = True
                break
        else:
            # fixed mode: normalize in-plan from the broadcast 1-row
            # norm over the cached frame — zero collects per round.
            x = y.crossJoin(F.broadcast(nr)).select(
                "vid", (F.col("y") / F.col("__nr")).alias("x")
            )

    e.unpersist()
    verts.unpersist()
    if not converged:
        raise RuntimeError(
            f"Eigenvector centrality failed to converge in {max_iter} "
            "iterations."
        )
    return x.select(F.col("vid").alias("id"), F.col("x").alias("eigenvector"))
