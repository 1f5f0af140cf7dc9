"""SALSA hubs/authorities (Lempel & Moran 2000) — the random-walk
sibling of HITS (north-rule link-analysis family, SURVEY.md §2.6; not
in the reference, which has no analytics at all).

SALSA replaces HITS's mutual-reinforcement sums with two independent
random walks on the *normalized* bipartite support graph: the
authority walk steps backward over an in-edge (uniformly over the
authority's in-edges) then forward over the hub's out-edges; the hub
walk is the mirror.  Per half-step, element-wise:

    u(i)  = Σ_{j ∈ out(i)} a(j) / indeg(j)      (authorities → hubs)
    a'(j) = Σ_{i ∈ in(j)}  u(i) / outdeg(i)     (hubs → authorities)
    v(j)  = Σ_{i ∈ in(j)}  h(i) / outdeg(i)     (hubs → authorities)
    h'(i) = Σ_{j ∈ out(i)} v(j) / indeg(j)      (authorities → hubs)

Both walks conserve total mass, so no per-round rescale exists at all
(cheaper than HITS: zero collects per round in any mode).

The walks are reducible across connected components of the bipartite
support graph, and Lempel & Moran's closed form gives the limit from
the uniform start exactly: within a support component C,

    authority(j) = (|C ∩ A| / |A|) · indeg(j) / Σ_{k ∈ C∩A} indeg(k)
    hub(i)       = (|C ∩ H| / |H|) · outdeg(i) / Σ_{k ∈ C∩H} outdeg(k)

where A/H are the sets of nodes with at least one in-/out-edge.  This
module implements BOTH forms:

- :func:`salsa` — the closed form: one distinct-edge support pass, one
  connected-components run on the bipartite support graph (reusing
  ``operators/components.py``), then per-component ``groupBy`` sums.
  This is the 100-TB path: no convergence loop at all; cost = one CC
  (O(log n) rounds with the star variant) + two aggregates.
- :func:`salsa_iterate` — the literal fixed-round power iteration, the
  SQL-replayable twin (driver value check ``salsa_fixed`` unrolls the
  identical dataflow one CTE block per round) and the differential
  anchor: tests/test_salsa.py pins iterate → closed form convergence
  and both against a numpy replica.

Scale shape (both): everything is distinct-edge joins keyed by vertex
id + ``groupBy`` sums with map-side combine; degree frames ride the
edge list; no UDFs, no driver loops over vertices; the iterate path
checkpoints per round with ``flat_checkpoint`` (stats-severed — see
``checkpoint.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint


def _support(edges: DataFrame) -> DataFrame:
    """Distinct directed support edges ``(src, dst)`` — SALSA is
    defined on the unweighted support graph."""
    return edges.select("src", "dst").distinct()


def _degrees(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(outdeg ``(src, od)``, indeg ``(dst, idg)``) over the support."""
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    idg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    return od, idg


def salsa(edges: DataFrame) -> DataFrame:
    """Closed-form SALSA scores: ``(id, hub double, authority double)``
    for every vertex of ``edges``; 0.0 for the side a vertex does not
    participate in.  Hub scores sum to 1 over all hubs, authority
    scores to 1 over all authorities (the uniform-start stationary
    limit of the two walks)."""
    from .components import connected_components

    e = _support(edges).persist()
    od, idg = _degrees(e)

    # Bipartite support: hub-side node "h:src" — authority-side "a:dst".
    bip = e.select(
        F.concat(F.lit("h:"), F.col("src").cast("string")).alias("src"),
        F.concat(F.lit("a:"), F.col("dst").cast("string")).alias("dst"),
    )
    comp = connected_components(bip)  # (id, component)

    auth = (
        idg.withColumn("__k", F.col("dst").cast("string"))
        .join(
            comp.where(F.col("id").startswith("a:")).select(
                F.expr("substring(id, 3)").alias("__k"),
                F.col("component").alias("c"),
            ),
            "__k",
        )
        .drop("__k")
    ).persist()
    hub = (
        od.withColumn("__k", F.col("src").cast("string"))
        .join(
            comp.where(F.col("id").startswith("h:")).select(
                F.expr("substring(id, 3)").alias("__k"),
                F.col("component").alias("c"),
            ),
            "__k",
        )
        .drop("__k")
    ).persist()

    n_auth = auth.count()
    n_hub = hub.count()
    if n_hub == 0:  # no edges at all
        e.unpersist()
        auth.unpersist()
        hub.unpersist()
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], "id string, hub double, authority double"
        )

    a_comp = auth.groupBy("c").agg(
        F.sum("idg").alias("cw"), F.count(F.lit(1)).alias("cn")
    )
    a_scores = auth.join(a_comp, "c").select(
        F.col("dst").alias("id"),
        (
            (F.col("cn") / F.lit(float(n_auth)))
            * (F.col("idg") / F.col("cw"))
        ).alias("authority"),
    )
    h_comp = hub.groupBy("c").agg(
        F.sum("od").alias("cw"), F.count(F.lit(1)).alias("cn")
    )
    h_scores = hub.join(h_comp, "c").select(
        F.col("src").alias("id"),
        (
            (F.col("cn") / F.lit(float(n_hub)))
            * (F.col("od") / F.col("cw"))
        ).alias("hub"),
    )

    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = (
        verts.join(h_scores, "id", "left")
        .join(a_scores, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
        .localCheckpoint()
    )
    e.unpersist()
    auth.unpersist()
    hub.unpersist()
    return out


def salsa_iterate(edges: DataFrame, rounds: int = 8) -> DataFrame:
    """Fixed-round SALSA power iteration: ``(id, hub, authority)``
    after exactly ``rounds`` full back-forward steps of each walk from
    the uniform start.  Converges to :func:`salsa` (the authority /
    hub chains are aperiodic — the 2-step walk can return to its
    start); fixed rounds keep the dataflow SQL-replayable for the
    driver value check."""
    e = _support(edges).persist()
    od, idg = _degrees(e)
    # normalized edge frame: each support edge with both degree shares
    en = (
        e.join(od, "src")
        .join(idg, "dst")
        .select("src", "dst", "od", "idg")
        .persist()
    )
    n_auth = idg.count()
    n_hub = od.count()
    if n_hub == 0:
        e.unpersist()
        en.unpersist()
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], "id string, hub double, authority double"
        )

    a = idg.select("dst", F.lit(1.0 / n_auth).alias("a")).transform(
        flat_checkpoint
    )
    h = od.select("src", F.lit(1.0 / n_hub).alias("h")).transform(
        flat_checkpoint
    )
    for _ in range(rounds):
        u = (
            en.join(a, "dst")
            .select("src", "od", (F.col("a") / F.col("idg")).alias("m"))
            .groupBy("src", "od")
            .agg(F.sum("m").alias("u"))
        )
        a = (
            en.select("src", "dst")
            .join(u, "src")
            .select("dst", (F.col("u") / F.col("od")).alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("a"))
            .transform(flat_checkpoint)
        )
        v = (
            en.join(h, "src")
            .select("dst", "idg", (F.col("h") / F.col("od")).alias("m"))
            .groupBy("dst", "idg")
            .agg(F.sum("m").alias("v"))
        )
        h = (
            en.select("src", "dst")
            .join(v, "dst")
            .select("src", (F.col("v") / F.col("idg")).alias("m"))
            .groupBy("src")
            .agg(F.sum("m").alias("h"))
            .transform(flat_checkpoint)
        )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = (
        verts.join(h.withColumnRenamed("src", "id"), "id", "left")
        .join(a.withColumnRenamed("dst", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
            F.coalesce("a", F.lit(0.0)).alias("authority"),
        )
        .localCheckpoint()
    )
    e.unpersist()
    en.unpersist()
    return out
