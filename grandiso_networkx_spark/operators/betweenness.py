"""Betweenness centrality via distributed Brandes (analytics op beside
closeness/katz — not in the reference; SURVEY.md §2.6 class; semantics
oracle is ``networkx.betweenness_centrality``).

Brandes' algorithm (2001) is two sweeps per source over the BFS DAG:
forward to count shortest paths (sigma), backward to accumulate pair
dependencies (delta).  Both sweeps are level-synchronous here and run
for ALL sources in one loop — state frames are keyed ``(source, id)``,
so a round is one equi join + one aggregation regardless of source
count, the same multi-source shape as closeness_centrality.

- Forward round d: frontier ⋈ edges → ``groupBy(source, dst)
  .sum(sigma)`` (map-side combine absorbs hub fan-in), anti join
  against visited — sigma of a new vertex is the sum over its
  depth-(d-1) predecessors, which is exactly Brandes' recurrence.
- Backward round d: vertices at depth d send ``sigma_v/sigma_w *
  (1 + delta_w)`` to their depth-(d-1) BFS-DAG predecessors (the
  dist-check join reconstructs the DAG from the sp table — no
  predecessor lists are materialized).  Every vertex's delta is
  complete after the single round that processes its depth+1.
- Exact all-pairs betweenness is inherently O(|V|·|E|); at scale
  callers pass a source SAMPLE (Brandes–Pich estimator) and the
  rescale extrapolates by n/k, matching ``nx.betweenness_centrality``
  with ``k`` samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import symmetrize


def _forward_sweep(e: DataFrame, src_frame: DataFrame, max_depth: int):
    """Multi-source BFS path counting: returns (sp, depth) where
    ``sp(source, id, dist, sigma)`` holds every reached vertex's BFS
    depth and shortest-path count from each source."""
    sp = src_frame.select(
        F.col("id").alias("source"),
        "id",
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint()
    frontier = sp.select("source", "id", "sigma")
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            frontier.join(e.withColumnRenamed("src", "id"), "id")
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(sp.select("source", "id"), ["source", "id"], "left_anti")
            .select("source", "id", F.lit(depth).alias("dist"), "sigma")
            .transform(flat_checkpoint)
        )
        if nxt.limit(1).count() == 0:
            depth -= 1
            break
        sp = sp.unionByName(nxt).transform(flat_checkpoint)
        frontier = nxt.select("source", "id", "sigma")
    else:
        raise RuntimeError(
            f"BFS did not terminate within max_depth={max_depth}."
        )
    return sp.persist(), depth


def betweenness_centrality(
    edges: DataFrame,
    sources: DataFrame | None = None,
    directed: bool = False,
    normalized: bool = True,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(id, betweenness double)`` for every vertex of the graph.

    ``sources=None`` computes the exact Brandes sum over all sources;
    an ``(id)`` DataFrame computes the k-sample estimator (dependency
    sums over those sources, rescaled by n/k like
    ``nx.betweenness_centrality(k=...)``).  ``normalized`` divides by
    the number of ordered/unordered non-endpoint pairs, matching
    networkx for both directednesses; unnormalized undirected results
    are halved (each undirected path is seen from both ends), also as
    in networkx.
    """
    e = (
        edges.select("src", "dst") if directed else symmetrize(edges)
    ).where(F.col("src") != F.col("dst")).persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    src_frame = verts if sources is None else sources.select("id").distinct()
    k = n if sources is None else src_frame.count()

    # ---- forward sweep: sp(source, id, dist, sigma) ----------------
    sp, depth = _forward_sweep(e, src_frame, max_depth)

    # ---- backward sweep: delta accumulates one level per round -----
    spark = edges.sparkSession
    delta = spark.createDataFrame(
        [], f"source {sp.schema['id'].dataType.simpleString()}, "
        f"id {sp.schema['id'].dataType.simpleString()}, delta double"
    )
    for d in range(depth, 0, -1):
        w_frame = (
            sp.where(F.col("dist") == d)
            .join(delta, ["source", "id"], "left")
            .select(
                "source",
                F.col("id").alias("w"),
                (
                    (F.lit(1.0) + F.coalesce("delta", F.lit(0.0)))
                    / F.col("sigma")
                ).alias("credit"),
            )
        )
        contrib = (
            w_frame.join(e.withColumnRenamed("dst", "w"), "w")
            .join(
                sp.where(F.col("dist") == d - 1).select(
                    "source", F.col("id").alias("src"), "sigma"
                ),
                ["source", "src"],
            )
            .groupBy("source", F.col("src").alias("id"))
            .agg(F.sum(F.col("credit") * F.col("sigma")).alias("delta"))
        )
        delta = delta.unionByName(contrib).transform(flat_checkpoint)

    bc = (
        delta.where(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.sum("delta").alias("betweenness"))
    )
    out = verts.join(bc, "id", "left").select(
        "id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )

    # networkx _rescale verbatim: normalized -> 1/((n-1)(n-2)) for both
    # directednesses (undirected raw sums are already double-counted);
    # unnormalized undirected -> 0.5; the n/k sample extrapolation only
    # applies when a scale exists (nx quirk: directed unnormalized
    # sampled results stay raw).
    if normalized:
        scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else None
    else:
        scale = None if directed else 0.5
    if scale is not None and sources is not None and k:
        scale = scale * n / k
    if scale is not None:
        out = out.select(
            "id", (F.col("betweenness") * F.lit(float(scale))).alias("betweenness")
        )
    e.unpersist()
    verts.unpersist()
    sp.unpersist()
    return out


def edge_betweenness(
    edges: DataFrame,
    sources: DataFrame | None = None,
    directed: bool = False,
    normalized: bool = True,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(src, dst, betweenness double)`` per edge — the fraction of
    all-pairs shortest paths crossing each edge (semantics oracle:
    ``networkx.edge_betweenness_centrality``; the Girvan–Newman
    community split removes the top-scoring edges of this table).

    Same two level-synchronous Brandes sweeps as
    :func:`betweenness_centrality`; the per-edge dependency is the
    backward sweep's pre-aggregation term ``sigma_v/sigma_w *
    (1 + delta_w)`` for the DAG edge v→w, so the only change is
    keeping that term grouped by edge as well as by predecessor.
    Undirected graphs canonicalize each symmetrized direction onto the
    unordered pair and sum, exactly as networkx accumulates both
    traversal directions onto one edge key.  Normalized scale is
    networkx's ``_rescale_e``: ``1/(n(n-1))`` when normalized (n>1),
    else 0.5 for undirected raw sums; the ``n/k`` Brandes–Pich
    extrapolation applies when ``sources`` samples.
    """
    e = (
        edges.select("src", "dst") if directed else symmetrize(edges)
    ).where(F.col("src") != F.col("dst")).persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    src_frame = verts if sources is None else sources.select("id").distinct()
    k = n if sources is None else src_frame.count()

    sp, depth = _forward_sweep(e, src_frame, max_depth)

    spark = edges.sparkSession
    idt = sp.schema["id"].dataType.simpleString()
    delta = spark.createDataFrame([], f"source {idt}, id {idt}, delta double")
    eacc = spark.createDataFrame([], f"u {idt}, v {idt}, c double")
    for d in range(depth, 0, -1):
        w_frame = (
            sp.where(F.col("dist") == d)
            .join(delta, ["source", "id"], "left")
            .select(
                "source",
                F.col("id").alias("w"),
                (
                    (F.lit(1.0) + F.coalesce("delta", F.lit(0.0)))
                    / F.col("sigma")
                ).alias("credit"),
            )
        )
        # one row per (source, DAG edge src→w): the edge's dependency
        per_edge = (
            w_frame.join(e.withColumnRenamed("dst", "w"), "w")
            .join(
                sp.where(F.col("dist") == d - 1).select(
                    "source", F.col("id").alias("src"), "sigma"
                ),
                ["source", "src"],
            )
            .select(
                "source",
                "src",
                "w",
                (F.col("credit") * F.col("sigma")).alias("c"),
            )
            .transform(flat_checkpoint)
            .persist()
        )
        contrib = (
            per_edge.groupBy("source", F.col("src").alias("id"))
            .agg(F.sum("c").alias("delta"))
        )
        delta = delta.unionByName(contrib).transform(flat_checkpoint)
        eacc = eacc.unionByName(
            per_edge.groupBy(
                F.col("src").alias("u"), F.col("w").alias("v")
            ).agg(F.sum("c").alias("c"))
        ).transform(flat_checkpoint)
        per_edge.unpersist()

    if directed:
        pair = [F.col("u").alias("src"), F.col("v").alias("dst")]
        base = e.select("src", "dst")
    else:
        pair = [
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
        ]
        base = e.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).distinct()
    eb = eacc.select(*pair, "c").groupBy("src", "dst").agg(
        F.sum("c").alias("betweenness")
    )
    out = base.join(eb, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )

    # networkx _rescale_e verbatim
    if normalized:
        scale = 1.0 / (n * (n - 1)) if n > 1 else None
    else:
        scale = None if directed else 0.5
    if scale is not None and sources is not None and k:
        scale = scale * n / k
    if scale is not None:
        out = out.select(
            "src",
            "dst",
            (F.col("betweenness") * F.lit(float(scale))).alias("betweenness"),
        )
    e.unpersist()
    verts.unpersist()
    sp.unpersist()
    return out
