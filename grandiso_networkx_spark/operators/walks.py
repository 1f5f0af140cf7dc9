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


def _hash60(col) -> F.Column:
    """60-bit portable hash (first 15 hex chars of md5) — identical
    expression exists in ANSI SQL, enabling DuckDB value checks."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


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
            .localCheckpoint()
        )
        out = out.unionAll(
            frontier.select(
                "start", "rep", F.lit(step).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )
    adj.unpersist()
    return out
