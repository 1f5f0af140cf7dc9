"""Stage 0: transcripts → link graph (SURVEY.md §3.0).

Not present in the reference (its hosts arrive as in-memory nx
objects); mandated by BASELINE.json ``north_star``: vertices are
conversation participants (``role:<role>``) and tools
(``tool:<tool>``); edges are

- ``reply``:  participant(turn i) → participant(turn i+1) within each
  conversation under *stable turn ordering* —
  ``Window.partitionBy(conv_id).orderBy(turn_idx)`` + ``lead`` — and
- ``invoke``: participant(role) → tool on every turn with a non-null
  ``tool``,

grouped to ``(src, dst, etype, weight)`` with weight = multiplicity.

Scale shape: the window is partition-local per ``conv_id`` (one shuffle
by conv_id, no global sort); the groupBy gets map-side partial
aggregation, so hub edges (every conv has user→assistant) collapse
before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import HostGraph


def derive_edges(transcripts: DataFrame) -> DataFrame:
    """``(src, dst, etype, weight)`` reply + invoke edges."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    participant = F.concat(F.lit("role:"), F.col("role"))
    reply = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            participant.alias("src"),
            F.lead(participant).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .select("src", "dst", F.lit("reply").alias("etype"))
    )
    invoke = transcripts.where(F.col("tool").isNotNull()).select(
        participant.alias("src"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("dst"),
        F.lit("invoke").alias("etype"),
    )
    return (
        reply.unionByName(invoke)
        .groupBy("src", "dst", "etype")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def derive_vertices(edges: DataFrame) -> DataFrame:
    """``(id, vtype)`` — participants ∪ tools appearing in any edge."""
    ids = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    return ids.distinct().select(
        "id",
        F.when(F.col("id").startswith("tool:"), F.lit("tool"))
        .otherwise(F.lit("participant"))
        .alias("vtype"),
    )


def derive_host_graph(
    transcripts: DataFrame, directed: bool = True, etype: str | None = None
) -> HostGraph:
    """Build a matchable/analyzable :class:`HostGraph` from transcripts.

    Collapses parallel reply/invoke edges between the same pair into a
    single simple edge (motif semantics need a simple graph); the etype
    and weight survive in the edge attrs map.
    """
    edges = derive_edges(transcripts)
    if etype is not None:
        edges = edges.where(F.col("etype") == etype)
    simple = edges.groupBy("src", "dst").agg(
        F.sum("weight").alias("weight"),
        F.array_join(F.array_sort(F.collect_set("etype")), ",").alias("etypes"),
    )
    with_attrs = simple.select(
        "src",
        "dst",
        F.create_map(
            F.lit("etype"), F.col("etypes"),
            F.lit("weight"), F.col("weight").cast("string"),
        ).alias("attrs"),
    )
    if not directed:
        # Canonical single-row-per-undirected-edge storage.
        with_attrs = (
            with_attrs.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "attrs",
            )
            .dropDuplicates(["src", "dst"])
        )
    verts = derive_vertices(edges).select(
        "id", F.create_map(F.lit("vtype"), F.col("vtype")).alias("attrs")
    )
    return HostGraph(with_attrs, verts, directed=directed)


def transcript_invariant_violations(transcripts: DataFrame) -> DataFrame:
    """Rows violating the per-row invariant (BASELINE.json input_hint):
    exactly one text per (conv_id, turn_idx) under stable turn ordering.
    Empty result = invariant holds."""
    return (
        transcripts.groupBy("conv_id", "turn_idx")
        .agg(F.count_distinct("text").alias("n_texts"), F.count(F.lit(1)).alias("n_rows"))
        .where((F.col("n_texts") > 1) | (F.col("n_rows") > 1))
    )
