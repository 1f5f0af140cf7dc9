"""Distributed frontier expansion — the engine's single physical operator.

The reference's ``get_next_backbone_candidates``
(``/root/reference/grandiso/__init__.py:113-342``) takes ONE partial
map and returns its one-node-larger extensions.  Here the unit of work
is the whole frontier: a **bindings DataFrame** with one column per
bound motif node and one row per partial match.  One call =
one level-synchronous round over every partial match at once:

    bindings ⋈ adjacency  (per required motif edge; the reference's
                           candidate generation at :229-281)
    → injectivity filters (``c not in backbone.values()``, :286)
    → candidate-domain semi-join (node attrs + degree prune, :287-289)
    → optional self-loop semi-join

Set-intersection over k required edges (:248-273) becomes one inner
join (producing the candidate column) followed by k-1 left-semi joins —
successive inner/semi joins on a simple graph are exactly set
intersection, with no row multiplication.

Edge-attribute predicates are applied *during* the join rather than on
complete maps as the reference does (:300-319): strictly smaller
intermediates, identical final result set.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Hashable

from pyspark.sql import Column, DataFrame, functions as F

from ..graph import HostGraph, attrs_subset_predicate
from ..plans.motif import BindPlan, BindStep, RequiredEdge


@dataclass(frozen=True)
class MatchPredicates:
    """P4 — caller-replaceable matching predicates.

    The reference lets callers swap all three match functions via
    kwargs (``grandiso/__init__.py:120-122``, ``:363-365``,
    ``:436-438``).  Here each replacement is a *Column factory*
    evaluated JVM-side inside the expansion joins — or, as the escape
    hatch, a vectorized ``pandas_udf(BooleanType())`` call — never
    per-row Python:

    - ``node_attr(motif_node, motif_attrs, host_attrs_col) -> Column``
      replaces ``_is_node_attr_match`` (``grandiso/__init__.py:29-55``).
    - ``node_structural(motif_node, motif_degree, host_degree_col) ->
      Column`` replaces ``_is_node_structural_match`` (``:58-78``);
      evaluated against the precomputed degree table.
    - ``edge_attr(motif_edge, motif_edge_attrs, host_attrs_col) ->
      Column`` replaces ``_is_edge_attr_match`` (``:81-110``);
      evaluated on adjacency rows during the binding join.
    """

    node_attr: Callable[[Hashable, dict, Column], Column] | None = None
    node_structural: Callable[[Hashable, int, Column], Column] | None = None
    edge_attr: Callable[[tuple, dict, Column], Column] | None = None

    @property
    def has_node_pred(self) -> bool:
        return self.node_attr is not None or self.node_structural is not None


def _domain(host: HostGraph, step: BindStep, preds: MatchPredicates | None) -> DataFrame:
    ap = sp = None
    if preds is not None:
        if preds.node_attr is not None:
            ap = preds.node_attr(step.node, dict(step.attrs), F.col("attrs"))
        if preds.node_structural is not None:
            sp = preds.node_structural(step.node, step.min_degree, F.col("degree"))
    return host.candidate_domain(dict(step.attrs), step.min_degree, ap, sp)


def _edge_frame(
    host: HostGraph,
    req: RequiredEdge,
    node: Hashable,
    preds: MatchPredicates | None = None,
    min_cand_deg: int | None = None,
) -> tuple[DataFrame, str]:
    """Adjacency rows oriented as (__cand, __oth) for one required edge.

    Returns the frame and the name of the physical join-key column on
    the edges side (useful for partition-aware planning).  With
    ``min_cand_deg`` the candidate endpoint's total degree (from the
    once-per-host :attr:`HostGraph.adjacency_deg` artifact) is bounded
    by an in-scan filter — the structural prune without a join.
    """
    with_cand_deg = min_cand_deg is not None
    adj = host.adjacency_deg if with_cand_deg else host.adjacency
    attrs = dict(req.attrs)
    motif_edge = (node, req.other) if req.out else (req.other, node)
    if preds is not None and preds.edge_attr is not None:
        adj = adj.where(preds.edge_attr(motif_edge, attrs, F.col("attrs")))
    elif attrs:
        adj = adj.where(attrs_subset_predicate(F.col("attrs"), attrs))
    if req.out:
        # motif edge (new -> other): candidates are predecessors of the
        # bound image of `other` (grandiso/__init__.py:242).
        if with_cand_deg:
            adj = adj.where(F.col("src_deg") >= F.lit(min_cand_deg))
        ef = adj.select(F.col("src").alias("__cand"), F.col("dst").alias("__oth"))
        key = "dst"
    else:
        # motif edge (other -> new): candidates are successors
        # (grandiso/__init__.py:239).
        if with_cand_deg:
            adj = adj.where(F.col("dst_deg") >= F.lit(min_cand_deg))
        ef = adj.select(F.col("dst").alias("__cand"), F.col("src").alias("__oth"))
        key = "src"
    if host.hint_small:
        ef = F.broadcast(ef)
    return ef, key


def seed_frontier(
    host: HostGraph,
    plan: BindPlan,
    col_of: dict,
    preds: MatchPredicates | None = None,
) -> DataFrame:
    """Round 0 without hints: the start node's candidate domain.

    A filtered scan, no join (``grandiso/__init__.py:156-168``).  When
    the motif has more nodes to bind, a degree bound of 1 is implied by
    the expansion joins themselves (every surviving binding's seed image
    carries a host edge), so the degree semi-join is skipped for
    ``min_degree <= 1`` — result-identical, one less join.
    """
    step = plan.start
    if (
        plan.steps
        and step.min_degree <= 1
        and (preds is None or preds.node_structural is None)
    ):
        step = BindStep(
            node=step.node,
            required=step.required,
            min_degree=0,
            attrs=step.attrs,
            self_loop_attrs=step.self_loop_attrs,
        )
    dom = _domain(host, step, preds)
    if step.self_loop_attrs is not None:
        dom = _apply_self_loop(
            dom, F.col("id"), host, step.self_loop_attrs, step.node, preds
        )
    return dom.select(F.col("id").alias(col_of[step.node]))


def _apply_self_loop(
    df: DataFrame,
    cand: Column,
    host: HostGraph,
    loop_attrs: tuple,
    node: Hashable,
    preds: MatchPredicates | None = None,
) -> DataFrame:
    loops = host.adjacency.where(F.col("src") == F.col("dst"))
    attrs = dict(loop_attrs)
    if preds is not None and preds.edge_attr is not None:
        loops = loops.where(preds.edge_attr((node, node), attrs, F.col("attrs")))
    elif attrs:
        loops = loops.where(attrs_subset_predicate(F.col("attrs"), attrs))
    loops = loops.select(F.col("src").alias("__loop_id"))
    if host.hint_small:
        loops = F.broadcast(loops)
    return df.join(loops, cand == F.col("__loop_id"), "left_semi")


def expand_step(
    frontier: DataFrame,
    step: BindStep,
    host: HostGraph,
    col_of: dict,
    bound: list[Hashable],
    preds: MatchPredicates | None = None,
    hub_salt: int | None = None,
    hub_degree_threshold: int = 100_000,
) -> DataFrame:
    """One expansion round: bind ``step.node`` on every frontier row.

    ``hub_salt`` (r5): selective skew salting for the first
    required-edge join.  The expansion join's OUTPUT explodes as
    |frontier rows keyed at v| x deg(v); for a hub vertex the whole
    product lands in ONE sort-merge partition, and AQE's skew split
    cannot help — it detects oversized shuffle INPUT partitions, and
    the hub's input rows are tiny (measured: a deg-10k hub makes the
    K3 round-1 join 12x slower at 16 cores while frontier row counts
    stay trivial — scripts/motif_hub_stress.py).  With ``hub_salt=R``,
    adjacency rows whose join key has total degree >=
    ``hub_degree_threshold`` get a salt ``pmod(xxhash64(candidate),
    R)`` and frontier rows keyed at such vertices replicate across all
    R salts, splitting the hub product over R tasks.  Cold keys keep
    salt 0 — no replication, identical join cardinality, bit-identical
    output (pinned by tests).  Off (``None``) by default: plans are
    unchanged unless a caller opts in for hub-heavy hosts.
    """
    new_col = col_of[step.node]
    if not step.required:
        raise ValueError(
            f"Motif node {step.node!r} has no motif edges into the bound set."
        )

    # The reference's degree lower-bound prune (grandiso/__init__.py:
    # 58-78, applied per step at :287-289) rides along the first
    # expansion join as a filter on the adjacency side's precomputed
    # candidate-degree column — same pruning power, no per-round
    # semi-join.  It is load-bearing for hub hosts (star graphs: the
    # frontier otherwise squares through the hub before the k-edge
    # intersection can cut it).  Vacuous for min_degree <= 1 (the
    # candidate arrived via a host edge); custom P4 predicates keep
    # the explicit domain join below instead.
    inline_deg = step.min_degree >= 2 and (
        preds is None or not preds.has_node_pred
    )

    # First required edge materializes the candidate column (inner join).
    ef, _ = _edge_frame(
        host,
        step.required[0],
        step.node,
        preds,
        min_cand_deg=step.min_degree if inline_deg else None,
    )
    key_col = col_of[step.required[0].other]
    if hub_salt is not None and hub_salt > 1:
        r = int(hub_salt)
        hot = F.broadcast(
            host.degrees.where(
                F.col("degree") >= F.lit(hub_degree_threshold)
            ).select(F.col("id").alias("__hot"))
        )
        ef = (
            ef.join(hot, ef["__oth"] == F.col("__hot"), "left")
            .withColumn(
                "__esalt",
                F.when(
                    F.col("__hot").isNotNull(),
                    F.pmod(F.xxhash64(F.col("__cand")), F.lit(r)),
                ).otherwise(F.lit(0)),
            )
            .drop("__hot")
        )
        fr = (
            frontier.join(hot, frontier[key_col] == F.col("__hot"), "left")
            .withColumn(
                "__fsalt",
                F.explode(
                    F.when(
                        F.col("__hot").isNotNull(),
                        F.sequence(F.lit(0), F.lit(r - 1)),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            .drop("__hot")
        )
        out = fr.join(
            ef,
            (ef["__oth"] == fr[key_col])
            & (ef["__esalt"] == fr["__fsalt"]),
            "inner",
        ).drop("__esalt", "__fsalt")
    else:
        out = frontier.join(
            ef, ef["__oth"] == frontier[key_col], "inner"
        )
    out = out.withColumnRenamed("__cand", new_col).drop("__oth")

    # Remaining required edges are set-intersection → left-semi joins.
    for req in step.required[1:]:
        ef, _ = _edge_frame(host, req, step.node, preds)
        out = out.join(
            ef,
            (ef["__oth"] == out[col_of[req.other]])
            & (ef["__cand"] == out[new_col]),
            "left_semi",
        )

    # Injectivity: the candidate differs from every bound image,
    # including hint-seeded ones (grandiso/__init__.py:286).
    for b in bound:
        out = out.where(F.col(new_col) != F.col(col_of[b]))

    # Node-attr prune (grandiso/__init__.py:287-289) and custom node
    # predicates (P4) are applied as a candidate-domain semi-join.  The
    # reference also degree-prunes here (:288), but for a DataFrame
    # engine that check is a full shuffle join whose result it can
    # never change: every motif edge at this node becomes a required-
    # edge join in some round and injectivity makes the endpoints
    # distinct, so any binding surviving to completion satisfies the
    # total-degree bound by construction.  A pure degree bound is
    # therefore an intermediate-size heuristic only — worth a one-time
    # filter on the seed scan, not a per-round |frontier|-row join —
    # and is skipped here unless attrs / custom predicates give the
    # domain real selectivity.
    if step.attrs or (preds is not None and preds.has_node_pred):
        dom = _domain(host, step, preds)
        if host.hint_small:
            dom = F.broadcast(dom)
        out = out.join(dom, out[new_col] == dom["id"], "left_semi")

    if step.self_loop_attrs is not None:
        out = _apply_self_loop(
            out, F.col(new_col), host, step.self_loop_attrs, step.node, preds
        )

    return out


def isomorphism_filter(
    bindings: DataFrame, plan: BindPlan, host: HostGraph, col_of: dict
) -> DataFrame:
    """Keep only induced matches (``isomorphisms_only=True``).

    The reference re-scans every ordered node pair of each complete map
    and rejects it if the host has an edge where the motif has none —
    including self-pairs (``grandiso/__init__.py:327-342``).

    Distributed formulation: a monomorphism already guarantees every
    motif edge's image exists, so a binding is induced **iff** the
    number of host adjacency rows among its image pairs equals the
    number of motif adjacency pairs.  That is ONE explode + ONE join +
    ONE aggregation instead of O(|non-edges|) anti-joins.
    """
    motif = plan.motif
    nodes = list(motif.nodes)
    cols = [col_of[n] for n in nodes]

    # Expected adjacency-row matches per binding.
    if plan.directed:
        expected = len(motif.edges)
    else:
        loops = sum(1 for (u, v) in motif.edges if u == v)
        expected = 2 * (len(motif.edges) - loops) + loops

    pairs = F.array(
        *[
            F.struct(F.col(col_of[u]).alias("u"), F.col(col_of[v]).alias("v"))
            for u in nodes
            for v in nodes
        ]
    )
    exploded = bindings.withColumn("__pair", F.explode(pairs))
    adj = host.adjacency.select(
        F.col("src").alias("__psrc"), F.col("dst").alias("__pdst")
    )
    if host.hint_small:
        adj = F.broadcast(adj)
    matched = exploded.join(
        adj,
        (F.col("__pair.u") == F.col("__psrc"))
        & (F.col("__pair.v") == F.col("__pdst")),
        "inner",
    )
    group_cols = [c for c in bindings.columns]
    counted = matched.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__nadj"))
    return counted.where(F.col("__nadj") == F.lit(expected)).drop("__nadj").select(
        *bindings.columns
    )
