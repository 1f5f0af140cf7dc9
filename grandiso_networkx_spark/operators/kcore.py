"""k-core subgraph, core-number decomposition, and k-truss by
distributed peeling.

Link-graph analytics op alongside SURVEY.md §2.6 (not in the reference —
grandiso has no analytics passes; semantics oracles are
``networkx.k_core`` / ``networkx.core_number`` / ``networkx.k_truss``).

Semantics: undirected simple graph — edge orientation ignored,
self-loops ignored (networkx's ``core_number`` refuses graphs with
self-loops outright; we keep the vertex, drop the loop).  The k-core is
the maximal subgraph where every vertex has degree >= k *within the
subgraph*; ``core_number(v)`` is the largest k whose k-core contains v.

Scale shape: level-synchronous peeling.  Each round is one
``groupBy(id).count`` over the surviving symmetrized edges (map-side
partial aggregation absorbs hub fan-in) plus two broadcast-able anti
joins removing every currently-sub-k vertex at once, so a round costs
one shuffle and the edge set shrinks monotonically.  Rounds = the
graph's peel depth for :func:`k_core`; :func:`core_number` runs one
peel phase per core level (k_max phases — bounded by sqrt(2|E|), small
for real link graphs).  The shrinking edge frame is ``localCheckpoint``
-ed per round (flat lineage), mirroring the engine's other iterative
passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import symmetrize


def _simple_sym(edges: DataFrame) -> DataFrame:
    """Symmetrized, self-loop-free, deduplicated edge set."""
    return symmetrize(edges.where(F.col("src") != F.col("dst")))


def k_core(edges: DataFrame, k: int, max_iter: int = 500) -> DataFrame:
    """Vertices of the k-core: ``(id, degree)`` with ``degree`` = the
    vertex's degree inside the k-core subgraph (>= k by definition).

    Matches ``networkx.k_core(G, k).degree()`` on the same simple
    undirected graph.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    e = _simple_sym(edges).localCheckpoint()
    if k <= 1:
        # Every non-isolated vertex is in the 1-core; k=0 additionally
        # keeps isolated vertices, which a pure edge table cannot carry.
        return e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )
    for _ in range(max_iter):
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        low = deg.where(F.col("degree") < k).select("id").transform(flat_checkpoint)
        if low.limit(1).count() == 0:
            return deg
        e = (
            e.join(low.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(low.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .transform(flat_checkpoint)
        )
    raise RuntimeError(f"k-core peeling did not converge in {max_iter} rounds.")


def k_truss(edges: DataFrame, k: int, max_iter: int = 500) -> DataFrame:
    """Edges of the k-truss as ``(src, dst)`` with ``src < dst`` —
    ``networkx.k_truss(G, k).edges()`` on the same simple undirected
    graph: the maximal subgraph where every edge is supported by at
    least ``k - 2`` triangles *within the subgraph*.

    Scale shape: edge-level peeling.  Each round recomputes per-edge
    support with the same two-equi-join wedge closure the triangle
    operator uses (work Σ deg², map-side combined), then drops EVERY
    under-supported edge at once via one anti join — level-synchronous
    like k-core, but the peeled unit is an edge.  The surviving edge
    frame is ``localCheckpoint``-ed per round (flat lineage); rounds =
    the truss peel depth, not the edge count.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    # Canonical orientation (a < b), deduped, loop-free.
    e = (
        _simple_sym(edges)
        .where(F.col("src") < F.col("dst"))
        .localCheckpoint()
    )
    if k == 2:
        # Every edge is trivially 0-supported-or-better: the 2-truss is
        # the whole simple graph.
        return e
    need = k - 2
    n_before = e.count()
    for _ in range(max_iter):
        sym = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        s1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("w"))
        s2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("w"))
        sup = (
            e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .join(s1, "a")
            .join(s2, ["b", "w"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= need)
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        # Semi join keeps only well-supported edges; edges with zero
        # common neighbors never reach `sup` and drop out here too.
        kept = e.join(sup, ["src", "dst"], "left_semi").transform(flat_checkpoint)
        n_kept = kept.count()  # count carried forward: one job per round
        e = kept
        if n_kept == n_before or n_kept == 0:
            return e
        n_before = n_kept
    raise RuntimeError(f"k-truss peeling did not converge in {max_iter} rounds.")


def truss_number(edges: DataFrame, max_iter: int = 2000) -> DataFrame:
    """Full truss decomposition: ``(src, dst, truss int)`` with
    ``src < dst`` — ``truss(e)`` is the largest ``k`` such that edge
    ``e`` survives in ``networkx.k_truss(G, k)`` on the same simple
    undirected graph (every edge is trivially in the 2-truss, so
    ``truss >= 2``).

    Same phase structure as :func:`core_number` but the peeled unit is
    an edge and the level test is triangle support: phase ``k`` strips
    (to a fixpoint) every edge supported by fewer than ``k - 2``
    triangles among surviving edges; an edge removed during phase ``k``
    survived phase ``k - 1``, so its trussness is ``k - 1``.  Each
    round costs one wedge-closure support count (two equi joins,
    Σ deg² work, map-side combined) + one anti join — the edge frame
    shrinks monotonically and is ``localCheckpoint``-ed per round.
    Total rounds = Σ per-level peel depths, bounded by the truss peel
    sequence, never the edge count.
    """
    e = (
        _simple_sym(edges)
        .where(F.col("src") < F.col("dst"))
        .localCheckpoint()
    )
    spark = edges.sparkSession
    id_type = e.schema["src"].dataType.simpleString()
    assigned = spark.createDataFrame(
        [], f"src {id_type}, dst {id_type}, truss int"
    )
    k = 3
    rounds = 0
    while e.limit(1).count() > 0:
        # Phase k: peel support < k-2 to a fixpoint; dropped edges get
        # trussness k-1.
        need = k - 2
        while True:
            rounds += 1
            if rounds > max_iter:
                raise RuntimeError(
                    f"truss peeling did not converge in {max_iter} rounds."
                )
            sym = e.unionAll(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            s1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("w"))
            s2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("w"))
            ok = (
                e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
                .join(s1, "a")
                .join(s2, ["b", "w"])
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("support"))
                .where(F.col("support") >= need)
                .select(F.col("a").alias("src"), F.col("b").alias("dst"))
            )
            kept = e.join(ok, ["src", "dst"], "left_semi").transform(flat_checkpoint)
            dropped = e.join(ok, ["src", "dst"], "left_anti")
            n_dropped = dropped.count()
            if n_dropped == 0:
                break
            assigned = assigned.unionByName(
                dropped.select("src", "dst", F.lit(k - 1).alias("truss"))
            ).transform(flat_checkpoint)
            e = kept
        k += 1
    return assigned


def core_number(edges: DataFrame, max_iter: int = 500) -> DataFrame:
    """Exact per-vertex core numbers ``(id, core)`` vs
    ``networkx.core_number`` on the same simple undirected graph.

    One peel phase per core level: phase k strips (to a fixpoint) every
    vertex whose surviving degree is < k; a vertex removed during phase
    k survived phase k-1, so its core number is k-1.  Vertices that
    appear only in self-loops get core 0 (their only edges are
    ignored).
    """
    sym = _simple_sym(edges)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = sym.localCheckpoint()
    spark = edges.sparkSession
    out_type = dict((f.name, f.dataType.simpleString()) for f in verts.schema.fields)[
        "id"
    ]
    assigned = spark.createDataFrame([], f"id {out_type}, core int")
    # `remaining` is tracked explicitly: a vertex can lose ALL its edges
    # when its neighbors peel (so it vanishes from the degree table) yet
    # still needs this phase's core assignment.
    remaining = e.select(F.col("src").alias("id")).distinct().localCheckpoint()
    k = 1
    rounds = 0
    while remaining.limit(1).count() > 0:
        # Phase k: peel deg<k to a fixpoint; the dropped get core k-1.
        while True:
            rounds += 1
            if rounds > max_iter:
                raise RuntimeError(
                    f"core-number peeling did not converge in {max_iter} rounds."
                )
            deg = e.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("degree")
            )
            low = (
                remaining.join(deg, "id", "left")
                .where(F.coalesce("degree", F.lit(0)) < k)
                .select("id")
                .transform(flat_checkpoint)
            )
            if low.limit(1).count() == 0:
                break
            assigned = assigned.unionByName(
                low.select("id", F.lit(k - 1).alias("core"))
            ).transform(flat_checkpoint)
            remaining = remaining.join(low, "id", "left_anti").transform(flat_checkpoint)
            e = (
                e.join(low.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(low.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .transform(flat_checkpoint)
            )
        k += 1
    # Isolated / self-loop-only vertices never enter the peel: core 0.
    return verts.join(assigned, "id", "left").select(
        "id", F.coalesce("core", F.lit(0)).alias("core")
    )


def densest_subgraph(
    edges: DataFrame, eps: float = 0.1, max_iter: int = 500
) -> DataFrame:
    """Greedy (2+2ε)-approximate densest subgraph (Bahmani–Kumar–
    Vassilvitskii VLDB'12): ``(id, density double)`` — the vertex set
    of the densest iterate, every row carrying its density
    ``|E(S)| / |S|``.

    The MapReduce-era peeling algorithm, exactly: repeat {compute the
    current subgraph's average degree d̄ = 2|E|/|V|; remove ALL
    vertices with degree ≤ (1+ε)·d̄/…} — each round strips a constant
    fraction of vertices, so O(log_{1+ε} n) rounds at any scale (vs
    the sequential exact peel's n rounds), and the best iterate's
    density is ≥ ρ*/(2(1+ε)).  Deterministic: a pure function of the
    edge set and ε (no RNG, no ordering sensitivity — whole degree
    classes peel together).

    Spark shape is the k-core loop's: one map-side-combined
    ``groupBy(id).count`` + two anti joins per round,
    ``localCheckpoint`` keeping lineage flat; the density/edge-count
    scalars are one tiny driver agg per round (the same carried-literal
    pattern as PageRank's convergence test).  The best round's vertex
    set is retained as a checkpointed frame, not recomputed.
    """
    if eps < 0:
        raise ValueError("eps must be >= 0")
    e = _simple_sym(edges).localCheckpoint()  # both orientations
    best_vs = None
    best_density = -1.0
    for _ in range(max_iter):
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        row = deg.agg(
            F.count(F.lit(1)).alias("nv"), F.sum("degree").alias("sumdeg")
        ).collect()[0]
        nv = row["nv"] or 0
        if nv == 0:
            break
        density = float(row["sumdeg"]) / (2.0 * nv)  # |E(S)|/|S|
        if density > best_density:
            best_density = density
            best_vs = deg.select("id").transform(flat_checkpoint)
        thresh = 2.0 * (1.0 + eps) * density  # (1+eps) * average degree
        low = (
            deg.where(F.col("degree") <= thresh).select("id").transform(flat_checkpoint)
        )
        e = (
            e.join(low.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(low.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .transform(flat_checkpoint)
        )
    else:
        raise RuntimeError(
            f"densest-subgraph peel did not empty in {max_iter} rounds."
        )
    if best_vs is None:
        id_type = edges.schema["src"].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            [], f"id {id_type}, density double"
        )
    return best_vs.select(
        "id", F.lit(best_density).cast("double").alias("density")
    )


def onion_layers(edges: DataFrame, max_iter: int = 500) -> DataFrame:
    """Onion decomposition ``(id, core, layer)`` — the peel-depth
    refinement of the k-core (Hébert-Dufresne, Grochow & Allard 2016;
    semantics oracle ``networkx.onion_layers``): within the core
    phases, every peel round that removes at least one vertex is one
    layer, numbered globally from 1.

    Same level-synchronous phase loop as :func:`core_number` (the core
    assignment here is bit-identical to it), with the effective-round
    counter carried as the layer id — no extra shuffles beyond the
    phase loop's own degree count + anti joins.  Vertices with only
    self-loops mirror networkx's isolated-vertex branch: they form
    layer 1 (core 0) and shift every peeled layer up by one.
    """
    sym = _simple_sym(edges)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = sym.localCheckpoint()
    spark = edges.sparkSession
    id_type = verts.schema["id"].dataType.simpleString()
    assigned = spark.createDataFrame([], f"id {id_type}, core int, layer int")
    remaining = e.select(F.col("src").alias("id")).distinct().localCheckpoint()
    # networkx onion_layers: degree-0 vertices are their own first layer
    iso = verts.join(remaining, "id", "left_anti").localCheckpoint()
    layer = 0
    if iso.limit(1).count() > 0:
        layer = 1
        assigned = assigned.unionByName(
            iso.select("id", F.lit(0).alias("core"), F.lit(1).alias("layer"))
        )
    k = 1
    rounds = 0
    while remaining.limit(1).count() > 0:
        while True:
            rounds += 1
            if rounds > max_iter:
                raise RuntimeError(
                    f"onion peeling did not converge in {max_iter} rounds."
                )
            deg = e.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("degree")
            )
            low = (
                remaining.join(deg, "id", "left")
                .where(F.coalesce("degree", F.lit(0)) < k)
                .select("id")
                .transform(flat_checkpoint)
            )
            if low.limit(1).count() == 0:
                break
            layer += 1
            assigned = assigned.unionByName(
                low.select(
                    "id",
                    F.lit(k - 1).alias("core"),
                    F.lit(layer).alias("layer"),
                )
            ).transform(flat_checkpoint)
            remaining = remaining.join(low, "id", "left_anti").transform(
                flat_checkpoint
            )
            e = (
                e.join(low.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(low.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .transform(flat_checkpoint)
            )
        k += 1
    return assigned
