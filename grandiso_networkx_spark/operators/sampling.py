"""Graph sampling for training pipelines: k-hop ego-nets and
contrastive link-training pairs (training-data ops — not in the
reference; SURVEY.md §2.7 class).

- :func:`ego_net` — the induced subgraph within ``radius`` hops of a
  center (``nx.ego_graph`` semantics): the per-example neighborhood
  extraction a GNN/feature pipeline runs per anchor.  Frontier BFS
  (one join + anti-join per hop — the engine's frontier-queue shape)
  then two semi joins induce the edges; no collect, no explosion.
- :func:`link_training_pairs` — (u, v, label) positives/negatives for
  contrastive embedding training.  Negatives are DETERMINISTIC: the
  i-th corruption of edge (u, v) picks vertex index
  ``md5(u|v|i|seed) % n`` from a dense sorted vertex index, then
  true-edge collisions and self-pairs are anti-joined away — so the
  sample is identical under any partitioning/retry and reproducible
  by the DuckDB oracle bit-for-bit.  The dense index is built WITHOUT
  a global single-partition sort: range-partition by id, rank within
  each partition in parallel, add per-partition offsets (a running
  sum over the tiny partition-count frame); the hot path is equi
  joins only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..checkpoint import flat_checkpoint

from .walks import _hash60


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def ego_net(
    edges: DataFrame,
    source,
    radius: int = 1,
    directed: bool = False,
) -> DataFrame:
    """Edges of the induced subgraph on vertices within ``radius`` hops
    of ``source`` (``nx.ego_graph`` semantics: digraphs follow
    successors; ``directed=False`` symmetrizes first).  Returns
    ``(src, dst)`` in the stored orientation, plus nothing for an
    isolated center (nx keeps the node; an edge table has no rows)."""
    if radius < 0:
        raise ValueError("radius must be >= 0")
    spark = edges.sparkSession
    e_dir = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    walkable = (e_dir if directed else _symmetrize(edges)).where(
        F.col("src") != F.col("dst")
    )
    id_type = edges.schema["src"].dataType.simpleString()
    nodes = spark.createDataFrame([(source,)], f"id {id_type}").localCheckpoint()
    frontier = nodes
    for _ in range(radius):
        nxt = (
            frontier.join(walkable.withColumnRenamed("src", "id"), "id")
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(nodes, "id", "left_anti")
            .transform(flat_checkpoint)
        )
        if nxt.limit(1).count() == 0:
            break
        nodes = nodes.unionByName(nxt).transform(flat_checkpoint)
        frontier = nxt
    return e_dir.join(
        nodes.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(nodes.withColumnRenamed("id", "dst"), "dst", "left_semi").select(
        "src", "dst"
    )


def _dense_vertex_index(verts: DataFrame, nparts: int) -> DataFrame:
    """``(id, __i long)`` with ``__i`` = 1-based global rank of ``id``,
    built WITHOUT a global single-partition sort: range-partition by id
    (range boundaries are totally ordered across partitions and
    distinct ids never straddle one), ``row_number`` WITHIN each
    partition in parallel, then add per-partition offsets — a running
    sum over the partition-count frame (``nparts`` rows), the
    heaps_fit doc-offset pattern.

    Delegates to the shared :func:`..functions.rank.global_row_number`
    (range-partition + in-partition rank + broadcast offsets; the
    partitioned input is ``localCheckpoint``-ed to pin boundaries).
    """
    from ..functions.rank import global_row_number

    return global_row_number(verts, [F.col("id")], nparts, out="__i").select(
        "id", "__i"
    )


def link_training_pairs(
    edges: DataFrame,
    neg_per_pos: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Contrastive training pairs ``(u, v, label int)``: every distinct
    edge as a positive (label 1) plus up to ``neg_per_pos``
    deterministic corruptions of its dst (label 0).  Corruptions that
    hit a true edge or the anchor itself are dropped (standard filtered
    negative sampling), so a positive can yield fewer negatives."""
    if neg_per_pos < 1:
        raise ValueError("neg_per_pos must be >= 1")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # Dense 1..n index = global rank by id, parallel (see
    # _dense_vertex_index; plan pinned by tests/test_plan_gates_r3.py).
    spark = edges.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    idx = _dense_vertex_index(verts, nparts).persist()
    n = idx.count()

    cand = e.select(
        "src",
        "dst",
        F.explode(F.sequence(F.lit(0), F.lit(neg_per_pos - 1))).alias("__k"),
    ).select(
        "src",
        "dst",
        (
            F.pmod(
                _hash60(
                    F.concat_ws("|", F.col("src"), F.col("dst"), F.col("__k"),
                                F.lit(seed))
                ),
                F.lit(n),
            )
            + 1
        ).cast("long").alias("__i"),
    )
    negs = (
        cand.join(F.broadcast(idx) if n <= 5_000_000 else idx, "__i")
        .select("src", F.col("id").alias("neg_dst"))
        .where(F.col("neg_dst") != F.col("src"))
        .dropDuplicates(["src", "neg_dst"])
        .join(
            e.select("src", F.col("dst").alias("neg_dst")),
            ["src", "neg_dst"],
            "left_anti",
        )
        .select("src", F.col("neg_dst").alias("dst"), F.lit(0).alias("label"))
    )
    out = e.select("src", "dst", F.lit(1).alias("label")).unionByName(negs)
    return out


def neighbor_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: list[int],
    seed: int = 42,
    directed: bool = False,
) -> DataFrame:
    """GraphSAGE-style layered neighbor sampling: ``(hop, src, dst)``
    edge blocks, hop 1 = edges out of the seed set, hop h = edges out
    of hop h-1's sampled frontier; every frontier vertex keeps at most
    ``fanouts[h-1]`` neighbors, chosen by portable-md5 rank of
    ``src|dst|hop|seed`` — the GNN mini-batch primitive, deterministic
    under any partitioning/retry/engine (unlike rand()-based samplers,
    a retried task resamples the identical neighbors).

    Scale shape per hop: one equi join (frontier onto the adjacency)
    + one ``row_number`` window partitioned by the frontier vertex —
    a hub contributes at most ``fanout`` sampled edges per hop no
    matter its degree, which is the entire point of layered sampling.
    The frontier stays a distinct vertex frame (revisited vertices
    resample the same neighbors — md5 rank is hop-dependent but
    visit-independent).
    """
    if not fanouts or any(f <= 0 for f in fanouts):
        raise ValueError("fanouts must be a non-empty list of positive ints")
    e = (
        (edges.select("src", "dst") if directed else _symmetrize(edges))
        .where(F.col("src") != F.col("dst"))
        .distinct()  # multi-edges must not eat fanout slots twice
        .persist()
    )
    frontier = seeds.select(F.col("id").alias("src")).distinct()
    spark = edges.sparkSession
    idt = e.schema["src"].dataType.simpleString()
    out = spark.createDataFrame([], f"hop int, src {idt}, dst {idt}")
    for h, fan in enumerate(fanouts, start=1):
        w = Window.partitionBy("src").orderBy("__r", "dst")
        block = (
            frontier.join(e, "src")
            .withColumn(
                "__r",
                _hash60(
                    F.concat_ws(
                        "|",
                        F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                        F.lit(str(h)),
                        F.lit(str(seed)),
                    )
                ),
            )
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= fan)
            .select(F.lit(h).alias("hop"), "src", "dst")
            .transform(flat_checkpoint)
        )
        out = out.unionByName(block)
        frontier = block.select(F.col("dst").alias("src")).distinct()
    e.unpersist()
    return out
