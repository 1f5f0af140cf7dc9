"""Closeness + harmonic centrality via multi-source level-synchronous
BFS (analytics ops beside bfs_levels — not in the reference; SURVEY.md
§2.6 class; semantics oracles are ``networkx.closeness_centrality`` /
``networkx.harmonic_centrality``).

One BFS loop answers ALL requested sources simultaneously: the frontier
frame is ``(source, id)`` pairs, so a round is still a single equi join
frontier ⋈ edges + one anti join against the visited set — k sources
ride the same two shuffles, not k loops.  Rounds = max eccentricity
over the sources.

Scale shape: the visited/distance frame holds one row per (source,
reached vertex) — all-pairs closeness on a huge graph is inherently
quadratic, so at scale callers pass a vertex SAMPLE as ``sources``
(the standard estimator); the loop cost is then |sample| * reachable,
partitioned by the compound key.  Per-round ``localCheckpoint`` keeps
lineage flat exactly as in bfs_levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import symmetrize


def _multi_source_bfs(
    edges: DataFrame,
    sources: DataFrame | None,
    directed: bool,
    max_depth: int,
) -> tuple[DataFrame, int]:
    """Shared BFS core: returns (``(source, id, dist)`` over all
    reached pairs, |V|).  ``directed=True`` walks reversed edges
    (INCOMING distance, the networkx convention for both closeness
    and harmonic on a DiGraph); default symmetrizes."""
    e = (
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if directed
        else symmetrize(edges)
    ).where(F.col("src") != F.col("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    src_frame = (
        verts if sources is None else sources.select("id").distinct()
    )

    dist = src_frame.select(
        F.col("id").alias("source"), "id", F.lit(0).alias("dist")
    ).localCheckpoint()
    frontier = dist.select("source", "id")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e.withColumnRenamed("src", "id"), "id")
            .select("source", F.col("dst").alias("id"))
            .dropDuplicates(["source", "id"])
            .join(dist.select("source", "id"), ["source", "id"], "left_anti")
            .select("source", "id", F.lit(depth).alias("dist"))
            .transform(flat_checkpoint)
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(nxt).transform(flat_checkpoint)
        frontier = nxt.select("source", "id")
    else:
        raise RuntimeError(
            f"BFS did not terminate within max_depth={max_depth}."
        )
    verts.unpersist()
    return dist, n


def closeness_centrality(
    edges: DataFrame,
    sources: DataFrame | None = None,
    directed: bool = False,
    wf_improved: bool = True,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(id, closeness double)`` for every vertex in ``sources`` (an
    ``(id)`` DataFrame; default = every vertex).

    ``directed=True`` uses INCOMING distance (BFS over reversed edges),
    matching ``nx.closeness_centrality`` on a DiGraph; the default
    symmetrizes first (undirected semantics).  ``wf_improved`` applies
    the Wasserman–Faust reachable-fraction scaling ``(r-1)/(n-1)``
    (the networkx default); vertices that reach nothing score 0.
    """
    dist, n = _multi_source_bfs(edges, sources, directed, max_depth)
    per_src = dist.groupBy("source").agg(
        F.count("*").alias("r"), F.sum("dist").alias("s")
    )
    base = (F.col("r") - 1) / F.col("s")
    if wf_improved and n > 1:
        base = base * (F.col("r") - 1) / F.lit(float(n - 1))
    return per_src.select(
        F.col("source").alias("id"),
        F.when(F.col("s") > 0, base).otherwise(F.lit(0.0)).alias("closeness"),
    )


def eccentricity(
    edges: DataFrame,
    sources: DataFrame | None = None,
    directed: bool = False,
    require_connected: bool = True,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(id, ecc long)`` — ``networkx.eccentricity`` semantics: the
    max shortest-path distance from each source to every vertex it
    reaches (OUTGOING distance, nx's convention for eccentricity on a
    DiGraph — note this is the opposite orientation from closeness).

    ``require_connected=True`` (default) raises ``RuntimeError`` when
    any source fails to reach the whole graph, mirroring nx's "Found
    infinite path length" error; ``False`` returns the max over the
    reachable set only (the standard per-component reading).

    Same one-loop multi-source BFS as closeness/harmonic; diameter /
    radius / center / periphery are one tiny aggregation over this
    output."""
    dist, n = _multi_source_bfs(
        # _multi_source_bfs reverses edges when directed=True (incoming
        # distance); eccentricity wants outgoing, so pre-swap.
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if directed
        else edges,
        sources,
        directed,
        max_depth,
    )
    per_src = dist.groupBy("source").agg(
        F.max("dist").alias("ecc"), F.count(F.lit(1)).alias("r")
    )
    if require_connected:
        short = per_src.where(F.col("r") < n).limit(1).collect()
        if short:
            raise RuntimeError(
                "Found infinite path length: graph is not "
                + ("strongly connected." if directed else "connected.")
            )
    return per_src.select(F.col("source").alias("id"), "ecc")


def distance_profile(
    edges: DataFrame,
    sources: DataFrame | None = None,
    wf_improved: bool = True,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(id, closeness double, harmonic double, ecc long)`` from ONE
    multi-source BFS over the undirected graph — closeness, harmonic
    and eccentricity differ only in the per-source aggregate, so a
    combined profile pays for the (source, reached) distance frame
    once instead of three times.  Undirected only: on digraphs nx's
    closeness/harmonic use incoming distance but eccentricity uses
    outgoing, so a single BFS cannot serve all three.

    Semantics match ``closeness_centrality`` (Wasserman–Faust scaled),
    ``harmonic_centrality`` and ``eccentricity(require_connected=
    False)`` exactly — pinned by tests/test_centrality.py."""
    dist, n = _multi_source_bfs(edges, sources, False, max_depth)
    per_src = dist.groupBy("source").agg(
        F.count("*").alias("r"),
        F.sum("dist").alias("s"),
        F.sum(
            F.when(F.col("dist") > 0, F.lit(1.0) / F.col("dist")).otherwise(
                F.lit(0.0)
            )
        ).alias("harmonic"),
        F.max("dist").alias("ecc"),
    )
    base = (F.col("r") - 1) / F.col("s")
    if wf_improved and n > 1:
        base = base * (F.col("r") - 1) / F.lit(float(n - 1))
    return per_src.select(
        F.col("source").alias("id"),
        F.when(F.col("s") > 0, base).otherwise(F.lit(0.0)).alias("closeness"),
        "harmonic",
        "ecc",
    )


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame | None = None,
    directed: bool = False,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(id, harmonic double)`` — sum of 1/d(v, u) over all v that
    reach u (``networkx.harmonic_centrality`` semantics: incoming
    distance on digraphs, no normalization, unreachable pairs
    contribute 0).  Same one-loop multi-source BFS as closeness — the
    two centralities differ only in the final per-source aggregate."""
    dist, _ = _multi_source_bfs(edges, sources, directed, max_depth)
    return dist.groupBy("source").agg(
        F.sum(
            F.when(F.col("dist") > 0, F.lit(1.0) / F.col("dist")).otherwise(
                F.lit(0.0)
            )
        ).alias("harmonic")
    ).select(F.col("source").alias("id"), "harmonic")
