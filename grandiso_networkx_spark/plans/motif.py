"""Motif representation and the bind-order planner.

The motif ("the query") is tiny — dozens of nodes at most — so, unlike
the host graph, it lives as a plain driver-side Python object and is
compiled *once* into a :class:`BindPlan` before any distributed work
starts.  The reference re-derives the next node to bind inside every
expansion call (``/root/reference/grandiso/__init__.py:170-207``); with
a fixed motif and fixed hint key-set that sequence is deterministic, so
we hoist it to plan time.  Result *sets* are bind-order independent —
only intermediate sizes change — so the planner is free to use a
strictly-most-constrained-first order (the reference's accumulated-max
quirk at ``:199-207`` can pick a less-connected node; ours never does,
which only shrinks frontiers).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Hashable, Iterable


class Motif:
    """A small query graph: nodes/edges with subset-match attributes.

    Mirrors the parts of ``nx.(Di)Graph`` the reference consumes:
    insertion-ordered nodes, ``adj``/``pred`` neighbor sets, attribute
    dicts, and total degree (self-loops count twice,
    ``grandiso/__init__.py:78`` semantics).
    """

    def __init__(self, directed: bool = True) -> None:
        self.directed = directed
        self.nodes: dict[Hashable, dict] = {}
        self.edges: dict[tuple[Hashable, Hashable], dict] = {}
        self._succ: dict[Hashable, set] = {}
        self._pred: dict[Hashable, set] = {}

    # -- construction ------------------------------------------------------

    def add_node(self, node: Hashable, **attrs) -> None:
        self.nodes.setdefault(node, {}).update(attrs)
        self._succ.setdefault(node, set())
        self._pred.setdefault(node, set())

    def add_edge(self, u: Hashable, v: Hashable, **attrs) -> None:
        self.add_node(u)
        self.add_node(v)
        if not self.directed and (v, u) in self.edges and (u, v) != (v, u):
            self.edges[(v, u)].update(attrs)
        else:
            self.edges.setdefault((u, v), {}).update(attrs)
        self._succ[u].add(v)
        self._pred[v].add(u)
        if not self.directed:
            self._succ[v].add(u)
            self._pred[u].add(v)

    @classmethod
    def from_networkx(cls, g) -> "Motif":
        import networkx as nx

        m = cls(directed=isinstance(g, nx.DiGraph))
        for n, attrs in g.nodes(data=True):
            m.add_node(n, **attrs)
        for u, v, attrs in g.edges(data=True):
            m.add_edge(u, v, **attrs)
        return m

    # -- queries -----------------------------------------------------------

    def neighbors(self, node: Hashable) -> set:
        """All neighbors regardless of direction (frontier connectivity)."""
        return self._succ[node] | self._pred[node]

    def degree(self, node: Hashable) -> int:
        """Total degree, self-loops counted twice (nx semantics)."""
        if self.directed:
            out_d = sum(1 for (u, v) in self.edges if u == node)
            in_d = sum(1 for (u, v) in self.edges if v == node)
            return out_d + in_d
        d = 0
        for (u, v) in self.edges:
            if u == node:
                d += 1
            if v == node:
                d += 1
        return d

    def edge_attrs(self, u: Hashable, v: Hashable) -> dict:
        if (u, v) in self.edges:
            return self.edges[(u, v)]
        if not self.directed and (v, u) in self.edges:
            return self.edges[(v, u)]
        raise KeyError((u, v))

    def has_edge(self, u: Hashable, v: Hashable) -> bool:
        return (u, v) in self.edges or (
            not self.directed and (v, u) in self.edges
        )

    def __len__(self) -> int:
        return len(self.nodes)


@dataclass(frozen=True)
class RequiredEdge:
    """One motif edge between the node being bound and a bound node.

    ``out`` is True when the motif edge points *from* the new node *to*
    ``other`` (the reference's ``(None, next, other)`` triple at
    ``grandiso/__init__.py:219``); False for the ``(other, next, None)``
    in-edge.  Undirected plans always use ``out`` over the symmetrized
    adjacency.  ``attrs`` are the motif edge's subset-match attributes.
    """

    other: Hashable
    out: bool
    attrs: tuple = ()


@dataclass(frozen=True)
class BindStep:
    """Bind one motif node: the unit of one distributed expansion round."""

    node: Hashable
    required: tuple[RequiredEdge, ...]
    min_degree: int
    attrs: tuple = ()
    self_loop_attrs: tuple | None = None  # motif self-loop on this node


@dataclass
class BindPlan:
    """Full compiled plan: seed step (or hint keys) + expansion steps."""

    motif: Motif
    directed: bool
    hint_keys: tuple = ()
    start: BindStep | None = None  # None when seeded from hints
    steps: list[BindStep] = field(default_factory=list)

    @property
    def bind_order(self) -> list:
        order = list(self.hint_keys)
        if self.start is not None:
            order.append(self.start.node)
        order.extend(s.node for s in self.steps)
        return order


def _freeze(attrs: dict) -> tuple:
    return tuple(sorted((str(k), str(v)) for k, v in attrs.items()))


def _required_edges(motif: Motif, node: Hashable, bound: set) -> tuple:
    """Motif edges from `node` into the bound set, excluding self-loops.

    Mirrors ``grandiso/__init__.py:215-224``: out-edges via ``adj``,
    plus in-edges via ``pred`` in directed mode.  Self-loops are never
    required edges there (the endpoint is not yet in the backbone) —
    they are handled as a separate per-step predicate instead of at
    complete-map verification (``:300-319``); earlier pruning, same
    final set.
    """
    req = []
    if motif.directed:
        for other in sorted(motif._succ[node] & bound, key=str):
            if other != node:
                req.append(
                    RequiredEdge(other, True, _freeze(motif.edge_attrs(node, other)))
                )
        for other in sorted(motif._pred[node] & bound, key=str):
            if other != node:
                req.append(
                    RequiredEdge(other, False, _freeze(motif.edge_attrs(other, node)))
                )
    else:
        for other in sorted(motif.neighbors(node) & bound, key=str):
            if other != node:
                req.append(
                    RequiredEdge(other, True, _freeze(motif.edge_attrs(node, other)))
                )
    return tuple(req)


def _make_step(motif: Motif, node: Hashable, bound: set) -> BindStep:
    loop = None
    if motif.has_edge(node, node):
        loop = _freeze(motif.edge_attrs(node, node))
    return BindStep(
        node=node,
        required=_required_edges(motif, node, bound),
        min_degree=motif.degree(node),
        attrs=_freeze(motif.nodes[node]),
        self_loop_attrs=loop,
    )


def uniform_node_interestingness(motif) -> dict:
    """All-ones interestingness — the reference's default planner stats
    (``grandiso/__init__.py:345-353``).  Accepts a :class:`Motif` or
    any object with iterable ``.nodes`` (e.g. ``nx.Graph``)."""
    return {n: 1.0 for n in motif.nodes}


def compile_plan(
    motif: Motif,
    hint_keys: Iterable[Hashable] = (),
    interestingness: dict | None = None,
) -> BindPlan:
    """Compile the bind order for a motif (optionally seeded by hints).

    Raises ``ValueError`` for the same inputs the reference does: an
    empty motif (empty ``max`` at ``grandiso/__init__.py:158``), a
    disconnected motif (``:275-281``), and hint keys that leave the
    remaining motif unreachable — which includes keys not in the motif
    at all (``grandiso/test_grandiso.py:458-462``).
    """
    if len(motif) == 0:
        raise ValueError("Cannot search for an empty motif.")
    hint_keys = tuple(hint_keys)
    for k in hint_keys:
        if k not in motif.nodes:
            raise ValueError(f"Hint key {k!r} is not a node of the motif.")
    interestingness = interestingness or {n: 1.0 for n in motif.nodes}

    bound = set(hint_keys)
    plan = BindPlan(motif=motif, directed=motif.directed, hint_keys=hint_keys)

    if not bound:
        # Start-node choice (reference: max interestingness, first wins
        # on ties via dict order — grandiso/__init__.py:156-159).
        node_list = list(motif.nodes)
        start = max(node_list, key=lambda n: interestingness.get(n, 0.0))
        plan.start = _make_step(motif, start, set())
        bound.add(start)

    while len(bound) < len(motif):
        # Most-constrained-first: maximize motif edges into the bound
        # set; ties broken by interestingness then insertion order.
        best = None
        best_key = (-1, -1.0)
        for idx, n in enumerate(motif.nodes):
            if n in bound:
                continue
            conn = sum(1 for v in motif.neighbors(n) if v in bound)
            key = (conn, interestingness.get(n, 0.0), -idx)
            if conn > 0 and key > best_key:
                best, best_key = n, key
        if best is None:
            if hint_keys and len(bound) == len(hint_keys):
                raise ValueError(
                    "Hints do not connect to the rest of the motif."
                )
            raise ValueError(
                "Motif is disconnected: found a motif node with no "
                "motif-graph edges into the already-bound set."
            )
        plan.steps.append(_make_step(motif, best, bound))
        bound.add(best)

    return plan
