"""Deterministic random-walk corpus generation (training-data op — not
in the reference; SURVEY.md §2.7 class).  Random-walk corpora are the
standard input for graph-embedding training (DeepWalk/node2vec), the
link-graph analogue of a tokenized text corpus.

Design:

- **Deterministic by construction**: the step-``s`` draw for walk
  ``(start, rep)`` is the portable md5 hash of ``start|rep|s`` modulo
  the current vertex's degree — no RNG state, so any partitioning /
  retry / re-run yields the identical corpus, and an independent DuckDB
  build reproduces it bit-for-bit (driver value check ``random_walks``).
- **One equi join per step, no explosion**: the walker joins the
  frontier to a per-vertex sorted neighbor-ARRAY table and selects
  ``element_at(nbrs, 1 + hash % size)`` — a hub vertex costs one row
  lookup per visiting walk, never a deg(hub)-row explode.
- **Hub cap** (``max_degree``): neighbor lists truncate
  deterministically (sorted order) at the cap — the fanout-sampling
  answer to hubs whose full adjacency array would be unstorable in one
  row; ``None`` keeps exact uniform walks.
- Each step's frontier is ``localCheckpoint``-ed: the step-``s`` frame
  is consumed twice (corpus union + next step's join), so without
  materialization the chain re-executes 2^length subtrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

_TWO_POW_60 = float(1 << 60)


def _hash60(col) -> F.Column:
    """60-bit portable hash (first 15 hex chars of md5) — identical
    expression exists in ANSI SQL, enabling DuckDB value checks."""
    from ..functions.hashing import hash60

    return hash60(col)


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    seed: int = 42,
    max_degree: int | None = None,
    directed: bool = True,
) -> DataFrame:
    """Uniform random walks over ``(src, dst)`` edges.

    Returns the long-format corpus ``(start, rep int, step int,
    vertex)`` — one row per visited position, step 0 = the start
    vertex; a walk ends early at a sink (no out-neighbors).  Walks
    start at every vertex that has at least one out-neighbor,
    ``walks_per_vertex`` times.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    nbrs = F.sort_array(F.collect_list("dst"))
    if max_degree is not None:
        nbrs = F.slice(nbrs, 1, max_degree)
    adj = e.groupBy("src").agg(nbrs.alias("nbrs")).persist()

    frontier = adj.select(
        F.col("src").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("rep"),
        F.col("src").alias("cur"),
    )
    out = frontier.select(
        "start", "rep", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )
    for step in range(1, walk_length + 1):
        draw = _hash60(
            F.concat_ws(
                "|",
                F.col("start"),
                F.col("rep"),
                F.lit(step),
                F.lit(seed),
            )
        )
        frontier = (
            frontier.join(adj, frontier["cur"] == adj["src"], "inner")
            .select(
                "start",
                "rep",
                F.element_at(
                    "nbrs", (F.pmod(draw, F.size("nbrs")) + 1).cast("int")
                ).alias("cur"),
            )
            .transform(flat_checkpoint)
        )
        out = out.unionAll(
            frontier.select(
                "start", "rep", F.lit(step).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )
    adj.unpersist()
    return out


def node2vec_walks(
    edges: DataFrame,
    p: float = 1.0,
    q: float = 1.0,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    seed: int = 42,
    max_degree: int | None = None,
    directed: bool = True,
) -> DataFrame:
    """Second-order biased walks (node2vec; Grover & Leskovec 2016)
    with the same deterministic portable-hash draws as
    ``random_walks``.

    Standing at ``cur`` having arrived from ``prev``, a candidate
    neighbor ``x`` weighs ``1/p`` if ``x == prev`` (return), ``1`` if
    ``x`` is also a neighbor of ``prev`` (BFS-like), else ``1/q``
    (DFS-like); the draw inverts the cumulative weight at
    ``u = hash(start|rep|step|seed) / 2^60``.  Step 1 is uniform (no
    predecessor), matching the reference algorithm.

    Fully deterministic and engine-portable: the cumulative sum folds
    the sorted neighbor array left-to-right, so an independent SQL
    build (window cumsum in the same order) reproduces the corpus
    bit-for-bit — the driver value check.  Per step the plan is two
    equi joins (adjacency of ``cur`` and of ``prev``) + one
    higher-order-function projection — still no per-row Python and no
    deg(hub) explode; ``max_degree`` caps both the candidate list and
    the BFS-membership list, trading exactness for bounded rows
    exactly as in ``random_walks``.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    nbrs = F.sort_array(F.collect_list("dst"))
    if max_degree is not None:
        nbrs = F.slice(nbrs, 1, max_degree)
    adj = e.groupBy("src").agg(nbrs.alias("nbrs")).persist()

    # Step 1: uniform draw, identical to random_walks.
    draw1 = _hash60(
        F.concat_ws("|", F.col("start"), F.col("rep"), F.lit(1), F.lit(seed))
    )
    frontier = (
        adj.select(
            F.col("src").alias("start"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
            ).alias("rep"),
            F.col("src").alias("prev"),
            "nbrs",
        )
        .select(
            "start",
            "rep",
            "prev",
            F.element_at(
                "nbrs", (F.pmod(draw1, F.size("nbrs")) + 1).cast("int")
            ).alias("cur"),
        )
        .localCheckpoint()
    )
    out = frontier.select(
        "start", "rep", F.lit(0).alias("step"), F.col("prev").alias("vertex")
    ).unionAll(
        frontier.select(
            "start", "rep", F.lit(1).alias("step"), F.col("cur").alias("vertex")
        )
    )

    ret_w, out_w = 1.0 / p, 1.0 / q
    for step in range(2, walk_length + 1):
        u = (
            _hash60(
                F.concat_ws(
                    "|", F.col("start"), F.col("rep"), F.lit(step), F.lit(seed)
                )
            ).cast("double")
            / F.lit(_TWO_POW_60)
        )
        cand = (
            frontier.join(adj.withColumnRenamed("src", "cur"), "cur")
            .join(
                adj.select(
                    F.col("src").alias("prev"), F.col("nbrs").alias("pnbrs")
                ),
                "prev",
            )
            .withColumn(
                "w",
                F.transform(
                    "nbrs",
                    lambda x: F.when(x == F.col("prev"), F.lit(ret_w))
                    .when(F.array_contains(F.col("pnbrs"), x), F.lit(1.0))
                    .otherwise(F.lit(out_w)),
                ),
            )
            # target = u * (left-to-right fold of w) — the same
            # sequential sum the SQL oracle's ordered window computes,
            # so the > comparison is bit-identical across engines.
            .withColumn(
                "target",
                u * F.aggregate("w", F.lit(0.0), lambda acc, w: acc + w),
            )
        )
        sel = F.aggregate(
            "w",
            F.struct(
                F.lit(0.0).alias("cum"),
                F.lit(0).alias("sel"),
                F.lit(0).alias("pos"),
            ),
            lambda acc, w: F.struct(
                (acc["cum"] + w).alias("cum"),
                F.when(
                    (acc["sel"] == 0) & (acc["cum"] + w > F.col("target")),
                    acc["pos"] + 1,
                )
                .otherwise(acc["sel"])
                .alias("sel"),
                (acc["pos"] + 1).alias("pos"),
            ),
            lambda acc: acc["sel"],
        )
        # sel == 0 only if float rounding left target >= total: take last.
        idx = F.when(sel == 0, F.size("nbrs")).otherwise(sel).cast("int")
        frontier = cand.select(
            "start",
            "rep",
            F.col("cur").alias("prev"),
            F.element_at("nbrs", idx).alias("cur"),
        ).transform(flat_checkpoint)
        out = out.unionAll(
            frontier.select(
                "start", "rep", F.lit(step).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )
    adj.unpersist()
    return out


def weighted_random_walks(
    edges: DataFrame,
    weight_col: str = "weight",
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    seed: int = 42,
    max_degree: int | None = None,
    directed: bool = True,
) -> DataFrame:
    """First-order edge-weight-biased walks: the next vertex is drawn
    proportionally to edge weight, by inverting the cumulative weight
    of the dst-sorted neighbor list at ``u = hash(start|rep|step|seed)
    / 2^60`` — the same deterministic draw-and-fold machinery as
    ``node2vec_walks``, one adjacency join per step instead of two.

    Weights must be positive (ValueError otherwise); duplicate
    ``(src, dst)`` rows sum their weights (multi-edge semantics).
    With integer-valued weights every partial sum is exact in double,
    so an independent SQL rebuild (ordered window cumsum) reproduces
    the corpus bit-for-bit — the driver value check
    ``weighted_walks``.  Output format matches ``random_walks``:
    ``(start, rep, step, vertex)``.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    e = edges.select(
        "src", "dst", F.col(weight_col).cast("double").alias("w")
    )
    if not directed:
        e = e.unionAll(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    e = e.where(F.col("src") != F.col("dst"))
    if e.where((F.col("w").isNull()) | (F.col("w") <= 0)).limit(1).count():
        raise ValueError("weights must be positive and non-null")
    pairs = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    nw = F.array_sort(F.collect_list(F.struct("dst", "w")))
    if max_degree is not None:
        nw = F.slice(nw, 1, max_degree)
    adj = (
        pairs.groupBy("src")
        .agg(nw.alias("nw"))
        .select(
            "src",
            F.transform("nw", lambda x: x["dst"]).alias("nbrs"),
            F.transform("nw", lambda x: x["w"]).alias("ws"),
        )
        .persist()
    )

    frontier = adj.select(
        F.col("src").alias("start"),
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
        ).alias("rep"),
        F.col("src").alias("cur"),
    )
    out = frontier.select(
        "start", "rep", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )
    for step in range(1, walk_length + 1):
        u = (
            _hash60(
                F.concat_ws(
                    "|", F.col("start"), F.col("rep"), F.lit(step), F.lit(seed)
                )
            ).cast("double")
            / F.lit(_TWO_POW_60)
        )
        cand = frontier.join(
            adj.withColumnRenamed("src", "cur"), "cur"
        ).withColumn(
            "target",
            u * F.aggregate("ws", F.lit(0.0), lambda acc, w: acc + w),
        )
        sel = F.aggregate(
            "ws",
            F.struct(
                F.lit(0.0).alias("cum"),
                F.lit(0).alias("sel"),
                F.lit(0).alias("pos"),
            ),
            lambda acc, w: F.struct(
                (acc["cum"] + w).alias("cum"),
                F.when(
                    (acc["sel"] == 0) & (acc["cum"] + w > F.col("target")),
                    acc["pos"] + 1,
                )
                .otherwise(acc["sel"])
                .alias("sel"),
                (acc["pos"] + 1).alias("pos"),
            ),
            lambda acc: acc["sel"],
        )
        idx = F.when(sel == 0, F.size("nbrs")).otherwise(sel).cast("int")
        frontier = cand.select(
            "start", "rep", F.element_at("nbrs", idx).alias("cur")
        ).transform(flat_checkpoint)
        out = out.unionAll(
            frontier.select(
                "start", "rep", F.lit(step).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )
    adj.unpersist()
    return out
