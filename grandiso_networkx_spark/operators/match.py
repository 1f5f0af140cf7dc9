"""Motif search drivers — the engine's query executors.

API parity with the reference's three entry points:

- :func:`find_motifs_df`   — the Spark-native surface: returns the
  complete-bindings DataFrame (one column per motif node).
- :func:`find_motifs_iter` — generator of ``{motif_id: host_id}`` dicts
  (``/root/reference/grandiso/__init__.py:356-427``).
- :func:`find_motifs`      — materializing wrapper with ``count_only``
  and ``limit`` (``grandiso/__init__.py:430-493``).

Semantics reproduced exactly (SURVEY.md §2.4): monomorphism by default
with no symmetry breaking (all automorphic images counted),
``isomorphisms_only`` induced check, hint seeds expanded independently
and concatenated (overlapping hints double-count), disconnected/empty
motif → ``ValueError``, ``limit``/``count_only`` interplay
(``limit=0``/None = unlimited, results = min(limit, total)).
"""

from __future__ import annotations

from typing import Generator, Hashable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..graph import HostGraph, attrs_subset_predicate
from ..plans.motif import Motif, compile_plan
from .frontier import (
    MatchPredicates,
    _edge_frame,
    expand_step,
    isomorphism_filter,
    seed_frontier,
)

SEED_COL = "__seed"


def _as_motif(motif) -> Motif:
    if isinstance(motif, Motif):
        return motif
    # nx motifs go through the adapter so attribute values get the same
    # repr-encoding as nx-loaded hosts (1 and "1" must stay distinct).
    from ..sources.nx_adapter import nx_to_motif

    return nx_to_motif(motif)


def _encode(host: HostGraph, value: Hashable):
    enc = getattr(host, "id_encoder", None)
    if enc is not None:
        return enc(value)
    return host.encode_id(value)


def _group_hints(hints: list[dict]) -> dict[tuple, list[tuple[int, dict]]]:
    """Group hint seeds by their key-set; keep the original seed index.

    The reference expands each seed independently and concatenates
    results (``grandiso/__init__.py:402-403``, ``:426-427``) — the same
    complete map reached from two seeds is counted twice
    (``test_grandiso.py:412-421``).  The seed index column preserves
    that multiplicity through distinct-free DataFrame plans.
    """
    groups: dict[tuple, list[tuple[int, dict]]] = {}
    for i, h in enumerate(hints):
        key = tuple(sorted(h.keys(), key=str))
        groups.setdefault(key, []).append((i, h))
    return groups


def find_motifs_df(
    motif,
    host: HostGraph,
    directed: bool | None = None,
    isomorphisms_only: bool = False,
    hints: list[dict] | None = None,
    interestingness: dict | None = None,
    checkpoint: "CheckpointManager | None" = None,
    keep_seed_col: bool = False,
    is_node_attr_match=None,
    is_node_structural_match=None,
    is_edge_attr_match=None,
    hub_salt: int | None = None,
    hub_degree_threshold: int = 100_000,
) -> DataFrame:
    """Build the complete-bindings DataFrame (lazy unless checkpointed).

    Output columns are the stringified motif node ids, in motif
    insertion order, plus ``__seed`` when ``keep_seed_col`` and hints
    are present.  Rows are NOT deduplicated — multiplicity from
    overlapping hints is part of the reference's contract.

    ``is_node_attr_match`` / ``is_node_structural_match`` /
    ``is_edge_attr_match`` mirror the reference's pluggable-predicate
    kwargs (``grandiso/__init__.py:363-365``) as Column factories — see
    :class:`~grandiso_networkx_spark.operators.frontier.MatchPredicates`
    for the signatures.

    ``hub_salt`` / ``hub_degree_threshold``: selective skew salting of
    the expansion joins for hub-heavy hosts (off by default; see
    :func:`~grandiso_networkx_spark.operators.frontier.expand_step` —
    the join-product skew AQE cannot split).
    """
    motif = _as_motif(motif)
    if directed is None:
        directed = motif.directed
    if directed != motif.directed:
        # Re-root the motif under the requested directedness (the
        # reference keys all adjacency logic off the `directed` flag,
        # grandiso/__init__.py:394-400).
        m2 = Motif(directed=directed)
        for n, attrs in motif.nodes.items():
            m2.add_node(n, **attrs)
        for (u, v), attrs in motif.edges.items():
            m2.add_edge(u, v, **attrs)
        motif = m2

    if host.directed and not directed:
        raise ValueError(
            "Undirected matching over a directed-stored host is ambiguous; "
            "symmetrize the host first (HostGraph(directed=False))."
        )

    spark = host.edges.sparkSession
    nodes = list(motif.nodes)
    col_of = {n: f"m{i}" for i, n in enumerate(nodes)}
    out_cols = [F.col(col_of[n]).alias(str(n)) for n in nodes]
    preds = None
    if is_node_attr_match or is_node_structural_match or is_edge_attr_match:
        preds = MatchPredicates(
            node_attr=is_node_attr_match,
            node_structural=is_node_structural_match,
            edge_attr=is_edge_attr_match,
        )

    def _run_group(hint_keys: tuple, seeds: list[tuple[int, dict]] | None) -> DataFrame:
        plan = compile_plan(motif, hint_keys, interestingness)
        steps = plan.steps
        if seeds is None:
            # Edge-seeded fusion: when the seed node is unconstrained
            # (no attrs / self-loop / custom node preds, degree bound
            # <= 1 implied by the joins) and the first step binds via
            # exactly one required edge with equally vacuous node
            # prunes, the round-1 frontier IS the adjacency table —
            # the all-vertices scan and the |V| x |E| seed join are
            # the identity on it.  One full join less per query, and
            # the only formulation that survives hosts where the
            # vertex set itself is too large to enumerate first.
            start = plan.start
            fused = (
                (preds is None or not preds.has_node_pred)
                and not start.attrs
                and start.min_degree <= 1
                and start.self_loop_attrs is None
                and steps
                and len(steps[0].required) == 1
                and not steps[0].attrs
                and steps[0].self_loop_attrs is None
            )
            if fused:
                s1 = steps[0]
                ef, _ = _edge_frame(
                    host,
                    s1.required[0],
                    s1.node,
                    preds,
                    min_cand_deg=s1.min_degree if s1.min_degree >= 2 else None,
                )
                frontier = (
                    ef.select(
                        F.col("__oth").alias(col_of[start.node]),
                        F.col("__cand").alias(col_of[s1.node]),
                    )
                    .where(F.col(col_of[s1.node]) != F.col(col_of[start.node]))
                    .withColumn(SEED_COL, F.lit(-1))
                )
                steps = steps[1:]
            else:
                frontier = seed_frontier(host, plan, col_of, preds).withColumn(
                    SEED_COL, F.lit(-1)
                )
        else:
            rows = [
                tuple([_encode(host, h[k]) for k in hint_keys] + [i])
                for i, h in seeds
            ]
            schema = T.StructType(
                [
                    T.StructField(col_of[k], host.id_spark_type, False)
                    for k in hint_keys
                ]
                + [T.StructField(SEED_COL, T.IntegerType(), False)]
            )
            frontier = spark.createDataFrame(rows, schema)
        bound = list(hint_keys)
        if plan.start is not None:
            bound.append(plan.start.node)
        for s in plan.steps[: len(plan.steps) - len(steps)]:
            bound.append(s.node)  # nodes bound by the fused seed, if any
        for rnd, step in enumerate(steps):
            frontier = expand_step(
                frontier,
                step,
                host,
                col_of,
                bound,
                preds,
                hub_salt=hub_salt,
                hub_degree_threshold=hub_degree_threshold,
            )
            bound.append(step.node)
            if checkpoint is not None:
                frontier = checkpoint.save(rnd, frontier, {"step": str(step.node)})
        # Hint-internal motif edges are never covered by required-edge
        # joins (those always touch the node being bound), but the
        # reference verifies EVERY motif edge once a map completes
        # (grandiso/__init__.py:300-319); only fully-complete hints
        # skip verification (:406-409).  One semi-join per such edge.
        if hint_keys:
            hk = set(hint_keys)
            for (u, v), eattrs in motif.edges.items():
                if u in hk and v in hk:
                    adj = host.adjacency
                    attrs_d = dict(eattrs)
                    if preds is not None and preds.edge_attr is not None:
                        adj = adj.where(
                            preds.edge_attr((u, v), attrs_d, F.col("attrs"))
                        )
                    elif attrs_d:
                        adj = adj.where(
                            attrs_subset_predicate(F.col("attrs"), attrs_d)
                        )
                    sel = adj.select(
                        F.col("src").alias("__hu"), F.col("dst").alias("__hv")
                    )
                    if host.hint_small:
                        sel = F.broadcast(sel)
                    frontier = frontier.join(
                        sel,
                        (F.col(col_of[u]) == F.col("__hu"))
                        & (F.col(col_of[v]) == F.col("__hv")),
                        "left_semi",
                    )
        if isomorphisms_only:
            frontier = isomorphism_filter(frontier, plan, host, col_of)
        return frontier.select(*out_cols, SEED_COL)

    if hints:
        parts = []
        for hint_keys, seeds in _group_hints(hints).items():
            if len(hint_keys) == len(motif):
                # A complete hint is yielded as-is, unverified — the
                # reference's walk() short-circuits before any expansion
                # or check runs (grandiso/__init__.py:406-409).
                rows = [
                    tuple([_encode(host, h[n]) for n in nodes] + [i])
                    for i, h in seeds
                ]
                schema = T.StructType(
                    [
                        T.StructField(str(n), host.id_spark_type, False)
                        for n in nodes
                    ]
                    + [T.StructField(SEED_COL, T.IntegerType(), False)]
                )
                parts.append(spark.createDataFrame(rows, schema))
            else:
                parts.append(_run_group(hint_keys, seeds))
        result = parts[0]
        for p in parts[1:]:
            result = result.unionByName(p)
    else:
        # `hints=[]` means full search (test_grandiso.py:374-382).
        result = _run_group((), None)

    if not keep_seed_col:
        result = result.drop(SEED_COL)
    return result


def find_motifs_iter(
    motif,
    host: HostGraph,
    **kwargs,
) -> Generator[dict, None, None]:
    """Stream complete mappings as ``{motif_id: host_id}`` dicts."""
    m = _as_motif(motif)
    df = find_motifs_df(m, host, **kwargs)
    decoder = getattr(host, "id_decoder", None) or (lambda s: s)
    nodes = list(m.nodes)
    for row in df.toLocalIterator():
        yield {n: decoder(row[i]) for i, n in enumerate(nodes)}


def find_motifs(
    motif,
    host: HostGraph,
    count_only: bool = False,
    limit: int | None = None,
    **kwargs,
):
    """Materialize matches: list of dicts, or an exact count.

    **API-parity surface, not the scale surface**: the no-limit list
    mode ``df.collect()``s every match onto the driver — fine for the
    reference-shaped workloads this mirrors, but a large host can
    yield more matches than driver memory.  At scale use
    :func:`find_motifs_df` (stay distributed), ``count_only=True``
    (one scalar), ``limit=`` (bounded collect), or
    :func:`find_motifs_iter` (``toLocalIterator`` — one partition in
    driver memory at a time).

    ``limit`` semantics follow the reference (``grandiso/__init__.py:
    479-487``): falsy limit = unlimited; both modes return
    min(limit, total).  On Spark the limit short-circuits inside the
    final collect instead of per-result driver checks.
    """
    m = _as_motif(motif)
    df = find_motifs_df(m, host, **kwargs)
    limit = limit or None
    if count_only:
        if limit is not None:
            return df.limit(limit).count()
        return df.count()
    if limit is not None:
        df = df.limit(limit)
    decoder = getattr(host, "id_decoder", None) or (lambda s: s)
    nodes = list(m.nodes)
    return [
        {n: decoder(row[i]) for i, n in enumerate(nodes)} for row in df.collect()
    ]
