"""DAG topological levels: longest-path depth per vertex + cycle
detection.

Link-graph analytics op alongside SURVEY.md §2.6 (not in the
reference; semantics oracle is ``networkx.dag_longest_path_length``
per vertex, i.e. ``level(v) = max path length over directed paths
ending at v``, 0 for sources).  The classic use over transcript
graphs is dependency depth: how many reply/invocation hops deep a
participant sits in the longest causal chain.

Scale shape — same pure-gather loop as HashMin connected components
(``operators/components.py``): the edge set is augmented with a
``delta=0`` self-loop per vertex (real edges carry ``delta=1``), so a
round is ONE equi join + ONE ``groupBy(dst).max(level+delta)`` — the
self-loop keeps the current level in the max, no separate merge join.
Levels only grow, and at the fixpoint every vertex holds its longest
in-path length; rounds = longest path length (the DAG depth).  A
cycle makes levels grow without bound, so any ``level >= |V|`` — or
failing to reach the fixpoint in ``|V|`` rounds — raises loudly
instead of silently truncating (same contract as
``temporal.earliest_arrival``).

Integer arithmetic only → bit-portable; the driver value check
(``dag_levels``) replays it as a DuckDB recursive-CTE longest-path
query over the same edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from ..functions.width import narrowed_shuffle as _narrowed_shuffle


def longest_path_levels(
    edges: DataFrame,
    max_rounds: int | None = None,
    unroll: int = 4,
) -> DataFrame:
    """``(id, level int)`` for every vertex of the directed graph:
    the length of the longest directed path ENDING at ``id`` (0 for
    vertices with no in-edges).  Raises ``ValueError`` if the graph
    has a directed cycle (longest path is then undefined).

    ``unroll`` rounds compose into one linear plan between
    materializations (exact — the gather is monotone and idempotent
    at the fixpoint, the same argument as HashMin's unroll).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # delta=1 real edges ∪ delta=0 self-loops: max(level(u)+delta)
    # over in-edges of v computes max(current, 1 + max in-nbr) in one
    # gather.
    e_self = (
        e.select("src", "dst", F.lit(1).alias("delta"))
        .unionAll(
            verts.select(
                F.col("id").alias("src"),
                F.col("id").alias("dst"),
                F.lit(0).alias("delta"),
            )
        )
        .persist()
    )
    n_rows = e_self.count()
    n = verts.count()
    # A DAG reaches the fixpoint in <= n-1 rounds; the extra window is
    # the changed==0 confirmation.  On a cyclic graph levels keep
    # growing, so the level >= n guard fires within the cap.
    cap = int(max_rounds) if max_rounds is not None else n + 2 * max(1, int(unroll))
    state = verts.select("id", F.lit(0).alias("level")).localCheckpoint()

    unroll = max(1, int(unroll))
    it = 0
    with _narrowed_shuffle(edges.sparkSession, n_rows):
        while it < cap:
            k = min(unroll, cap - it)
            cur = state
            for _ in range(k):
                cur = (
                    e_self.join(cur.withColumnRenamed("id", "src"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.max(F.col("level") + F.col("delta")).alias("level"))
                )
            new_state = (
                cur.join(
                    state.select("id", F.col("level").alias("__old")), "id"
                )
                .select(
                    "id",
                    "level",
                    (F.col("level") != F.col("__old")).alias("__changed"),
                )
                .transform(flat_checkpoint)
            )
            flags = new_state.agg(
                F.sum(F.col("__changed").cast("int")).alias("c"),
                F.max("level").alias("m"),
            ).collect()[0]
            state = new_state.drop("__changed")
            it += k
            if flags["m"] is not None and flags["m"] >= n:
                e_self.unpersist()
                raise ValueError(
                    "longest_path_levels: directed cycle detected "
                    f"(level reached {flags['m']} on a {n}-vertex graph)"
                )
            if flags["c"] == 0:
                e_self.unpersist()
                return state
    e_self.unpersist()
    raise ValueError(
        f"longest_path_levels: no fixpoint within {cap} rounds — "
        "the graph has a directed cycle (or raise max_rounds)"
    )


def coarsen_graph(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = None,
    drop_self_loops: bool = False,
) -> DataFrame:
    """Quotient (super-)graph of ``edges`` under the vertex partition
    ``labels`` ``(id, label)``: one output row per ordered label pair
    with ``(src_label, dst_label, edge_count long, weight double)``
    where ``weight`` sums ``weight_col`` (edge multiplicity when
    ``weight_col=None``).

    The contraction step of every multilevel algorithm (multilevel
    Louvain, coarsened layout/partitioning): after a clustering pass
    (connected components, LPA, WL colors) the next level runs on a
    graph |labels|-big instead of |V|-big.  Vertices missing from
    ``labels`` raise — a silent inner join would drop their edges.

    Scale shape: two label-attach equi joins (labels are |V|-sized —
    shuffled, never broadcast at scale; Spark's AQE broadcasts
    automatically when small) + one ``groupBy(src_label, dst_label)``
    with map-side combine.  No driver loop, no collect.
    """
    w = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ).alias("__w")
    e = edges.select("src", "dst", w)
    n_edges = e.count()
    lab_s = labels.select(
        F.col("id").alias("src"), F.col("label").alias("src_label")
    )
    lab_d = labels.select(
        F.col("id").alias("dst"), F.col("label").alias("dst_label")
    )
    joined = e.join(lab_s, "src").join(lab_d, "dst")
    out = joined.groupBy("src_label", "dst_label").agg(
        F.count("*").alias("edge_count"),
        F.sum("__w").alias("weight"),
    )
    if drop_self_loops:
        out = out.where(F.col("src_label") != F.col("dst_label"))
    # Coverage check rides the same aggregate tree: count the joined
    # rows once and compare against the input edge count.
    covered = joined.count()
    if covered != n_edges:
        raise ValueError(
            f"coarsen_graph: labels cover only {covered} of {n_edges} "
            "edge endpoints — every edge endpoint needs a label row"
        )
    return out
