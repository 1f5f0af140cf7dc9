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
``localCheckpoint`` for flat lineage.  Driver serial cost per round is
minimized with PageRank's carried-literal pattern
(``operators/pagerank.py``):

- ``a``'s per-round 1/max scale is NEVER collected in the loop — the h
  half-step consumes the RAW a (exactly as networkx does), so a's max
  only matters for the final output and is computed once after the
  loop.
- the previous h rides the new h frame as an ``hlast`` column (the
  verts-complete state frame IS the join target of the h update, so
  carrying it is free), and ONE combined agg per round returns both
  ``max(h)`` and the L1 delta — the 1/max needed inside the delta is a
  broadcast 1-row subquery over the already-materialized frame, not a
  separate driver job.
- fixed-iteration mode runs the RAW recurrence — per-round 1/max
  scaling is a pure stability device that cancels telescopically in
  every output (normalized: by the final 1/sum; unnormalized: by the
  final 1/max), so short fixed runs skip it entirely and apply the
  scale once at the end.  Deep fixed runs (where unscaled doubles
  could overflow) rescale in-plan from a broadcast 1-row max — still
  no driver collect.

Per-round driver jobs: 2 materializations + 1 combined agg
(convergence mode; the 1/max inside the L1 delta is a broadcast
subquery over the already-cached frame, not a second collect) or
2 materializations + 0 collects (fixed mode), down from +3/+2
collects — the serial fraction the N->4N scaling legs feel hardest
(pinned by the job-count gate in tests/test_hits_retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def _guarded_max(col):
    """max with networkx's ``or 1.0`` guard (empty/all-zero -> 1)."""
    return F.coalesce(F.nullif(F.max(col), F.lit(0.0)), F.lit(1.0))


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

    # h state is (vid, h[, hlast]) — h stored RAW; the per-round 1/max
    # scale is a carried literal (convergence mode, from the combined
    # agg), skipped (short fixed runs — it cancels in every output),
    # or an in-plan broadcast max (deep fixed runs, stability only).
    h_frame = verts.select("vid", F.lit(1.0 / n).alias("h")).localCheckpoint()
    h_scale: float | None = 1.0  # None -> scale in-plan from broadcast max
    # Unscaled iterates grow ~lambda_max(A^T A)^rounds; doubles hold
    # ~1e308, so short fixed runs never get near overflow and skip the
    # stability rescale entirely (zero extra jobs per round).
    raw_fixed = fixed_iterations is not None and fixed_iterations <= 40
    a_frame = None
    converged = fixed_iterations is not None
    for _ in range(max_iter):
        if raw_fixed:
            h_state = h_frame.select("vid", "h")
        elif h_scale is not None:
            h_state = h_frame.select(
                "vid", (F.col("h") * F.lit(h_scale)).alias("h")
            )
        else:
            mx = h_frame.agg(_guarded_max("h").alias("__hm"))
            h_state = h_frame.crossJoin(F.broadcast(mx)).select(
                "vid", (F.col("h") * (F.lit(1.0) / F.col("__hm"))).alias("h")
            )
        a_raw = (
            e.join(h_state.withColumnRenamed("vid", "src"), "src")
            .select("dst", (F.col("h") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("a"))
        )
        a_frame_new = (
            verts.join(a_raw, verts["vid"] == a_raw["dst"], "left")
            .select("vid", F.coalesce("a", F.lit(0.0)).alias("a"))
            .transform(flat_checkpoint)
        )
        # h from the RAW a (networkx scales a only for output).
        h_raw = (
            e.join(a_frame_new.withColumnRenamed("vid", "dst"), "dst")
            .select("src", (F.col("a") * F.col("w")).alias("__hn"))
            .groupBy("src")
            .agg(F.sum("__hn").alias("__hn"))
        )
        # h_state is verts-complete, so it is BOTH the update-join
        # spine and the free carrier of hlast for the L1 delta.
        h_frame_new = (
            h_state.join(
                h_raw, h_state["vid"] == h_raw["src"], "left"
            )
            .select(
                h_state["vid"],
                F.coalesce("__hn", F.lit(0.0)).alias("h"),
                h_state["h"].alias("hlast"),
            )
            .transform(flat_checkpoint)
        )
        if fixed_iterations is None:
            # ONE combined agg: the new max AND the L1 delta against
            # the previous scaled h — the 1/max inside the delta is a
            # broadcast 1-row subquery over the SAME materialized
            # frame (no recompute, no second driver job).
            mx = h_frame_new.agg(_guarded_max("h").alias("__hm"))
            row = (
                h_frame_new.crossJoin(F.broadcast(mx))
                .agg(
                    F.max("__hm").alias("hm"),
                    F.sum(
                        F.abs(
                            F.col("h") * (F.lit(1.0) / F.col("__hm"))
                            - F.col("hlast")
                        )
                    ).alias("err"),
                )
                .collect()[0]
            )
            h_scale = 1.0 / row["hm"]
            err = row["err"]
        else:
            # raw short runs keep scale 1 (cancels in output); deep
            # runs switch to in-plan broadcast scaling — no collects.
            h_scale = 1.0 if raw_fixed else None
            err = None
        h_frame = h_frame_new
        a_frame = a_frame_new
        if err is not None and err < tol:
            converged = True
            break

    if not converged:
        e.unpersist()
        verts.unpersist()
        raise RuntimeError(f"HITS failed to converge in {max_iter} iterations.")

    # Final scales: a's max was never collected in the loop; h's max is
    # already the carried literal in convergence mode.  Two tiny aggs
    # total, once per CALL (not per round).
    a_max = a_frame.agg(F.max("a")).collect()[0][0] or 1.0
    a_scale = 1.0 / a_max
    if h_scale is None or raw_fixed:
        h_max = h_frame.agg(F.max("h")).collect()[0][0] or 1.0
        h_scale = 1.0 / h_max

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
