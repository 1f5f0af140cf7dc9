"""Single-source shortest-path levels (unweighted BFS) by level-
synchronous frontier expansion.

Link-graph analytics op alongside SURVEY.md §2.6 (not in the reference;
semantics oracle is ``networkx.single_source_shortest_path_length``).
The loop is the same shape as the engine's other iterative passes — and
the distributed analogue of grandiso's partial-match queue: the
frontier DataFrame IS the queue, one round per BFS level.

Scale shape: each round is one equi join (frontier ⋈ edges on the
frontier's vertex — the |frontier|-row side broadcasts when small) plus
one anti join against the visited set, then a ``dropDuplicates`` on the
new level's vertices (map-side combine).  The visited set is the
accumulated result frame, ``localCheckpoint``-ed per round for flat
lineage; rounds = eccentricity of the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import symmetrize


def bfs_levels(
    edges: DataFrame,
    source,
    directed: bool = False,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(id, dist int)`` for every vertex reachable from ``source``
    (which has dist 0); unreachable vertices are absent.

    ``directed=False`` (default) symmetrizes the edge table first,
    matching ``nx.single_source_shortest_path_length`` on an undirected
    graph; ``directed=True`` follows stored orientation only.
    """
    spark = edges.sparkSession
    e = (
        edges.select("src", "dst")
        if directed
        else symmetrize(edges)
    ).where(F.col("src") != F.col("dst"))
    id_type = e.schema["src"].dataType.simpleString()
    dist = spark.createDataFrame([(source, 0)], f"id {id_type}, dist int")
    frontier = dist.select("id")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e.withColumnRenamed("src", "id"), "id")
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(dist.select("id"), "id", "left_anti")
            .select("id", F.lit(depth).alias("dist"))
            .transform(flat_checkpoint)
        )
        if nxt.limit(1).count() == 0:
            return dist
        dist = dist.unionByName(nxt).transform(flat_checkpoint)
        frontier = nxt.select("id")
    raise RuntimeError(f"BFS did not terminate within max_depth={max_depth}.")


def double_sweep(
    edges: DataFrame, directed: bool = False, max_depth: int = 10_000
) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib
    2009): BFS from the lexicographically smallest vertex, hop to the
    farthest vertex found (ties -> smallest id), BFS again; the second
    sweep's eccentricity is a high-quality diameter lower bound at the
    cost of exactly TWO BFS passes — the scale substitute for the
    all-sources eccentricity table.  One row: ``(start_id, far_id,
    diameter_lb)``.

    Operates on the start vertex's reachable component (the standard
    assumption).  The only driver-side data are two single-row
    collects (the start id and the farthest id) — the sweeps
    themselves are the distributed frontier loop of
    :func:`bfs_levels`.
    """
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    start = verts.agg(F.min("id").alias("id")).collect()[0]["id"]
    d1 = bfs_levels(edges, start, directed=directed, max_depth=max_depth)
    far = (
        d1.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]["id"]
    )
    d2 = bfs_levels(edges, far, directed=directed, max_depth=max_depth)
    return d2.agg(F.max("dist").alias("diameter_lb")).select(
        F.lit(start).alias("start_id"),
        F.lit(far).alias("far_id"),
        F.col("diameter_lb").cast("int").alias("diameter_lb"),
    )


def landmark_distances(
    edges: DataFrame,
    n_landmarks: int = 4,
    directed: bool = False,
    max_depth: int = 10_000,
) -> DataFrame:
    """Landmark distance table ``(landmark, id, dist)`` — exact BFS
    distances from the ``n_landmarks`` lexicographically smallest
    vertices to every vertex they reach (the classic distance-oracle /
    landmark-embedding preprocessing: at query time
    ``d(u,v) <= min_l d(u,l) + d(l,v)`` upper-bounds any pairwise
    distance from 2·k lookups instead of a BFS).

    One level-synchronous multi-source BFS keyed ``(landmark, id)`` —
    a round is one equi join + one anti join regardless of landmark
    count, the same loop shape as closeness/betweenness's forward
    sweep.  Landmark choice is deterministic (smallest ids) so the
    table is a pure function of the edge set; callers wanting
    degree-biased landmarks pass their own seed frame to
    :func:`bfs_levels` per landmark instead.
    """
    if n_landmarks <= 0:
        raise ValueError("n_landmarks must be positive")
    e = (
        edges.select("src", "dst")
        if directed
        else symmetrize(edges)
    ).where(F.col("src") != F.col("dst")).persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    lms = verts.orderBy("id").limit(n_landmarks)
    dist = lms.select(
        F.col("id").alias("landmark"), "id", F.lit(0).alias("dist")
    ).localCheckpoint()
    frontier = dist.select("landmark", "id")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e.withColumnRenamed("src", "id"), "id")
            .select("landmark", F.col("dst").alias("id"))
            .dropDuplicates(["landmark", "id"])
            .join(dist.select("landmark", "id"), ["landmark", "id"], "left_anti")
            .select("landmark", "id", F.lit(depth).alias("dist"))
            .transform(flat_checkpoint)
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(nxt).transform(flat_checkpoint)
        frontier = nxt.select("landmark", "id")
    else:
        raise RuntimeError(f"BFS did not terminate within max_depth={max_depth}.")
    e.unpersist()
    return dist
