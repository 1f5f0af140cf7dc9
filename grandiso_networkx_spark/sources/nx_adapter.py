"""networkx ↔ DataFrame adapters.

The reference's entire test corpus is built from ``nx.(Di)Graph``
fixtures (``/root/reference/grandiso/test_grandiso.py``); this adapter
loads any of them into the engine's edge/vertex tables so the ported
suite runs unchanged.  Node ids may be any Hashable — including falsy
``0`` (``test_grandiso.py:176-188``) — so ids are canonicalized to
strings with a driver-side reverse map for decoding results.  Attribute
values are encoded with ``repr`` so ``1`` and ``"1"`` stay distinct
under the reference's ``!=`` comparison semantics.
"""

from __future__ import annotations

from typing import Hashable

from pyspark.sql import SparkSession

from ..graph import EDGE_SCHEMA, VERTEX_SCHEMA, HostGraph
from ..plans.motif import Motif


def _encode_attrs(attrs: dict) -> dict:
    return {str(k): repr(v) for k, v in attrs.items()}


def nx_to_host(spark: SparkSession, g, hint_small: bool | None = None) -> HostGraph:
    """Load an ``nx.(Di)Graph`` as a :class:`HostGraph`.

    ``hint_small=True`` (default — nx graphs fit on the driver by
    definition) marks graph-side join inputs broadcastable so every
    expansion round is a broadcast hash join with no frontier shuffle.
    The test profile overrides via ``GISPARK_BROADCAST_SMALL=0``
    (plain shuffle joins at 1 partition are faster on 10-node hosts).
    """
    import os

    import networkx as nx

    if hint_small is None:
        hint_small = os.environ.get("GISPARK_BROADCAST_SMALL", "1") != "0"

    directed = isinstance(g, nx.DiGraph)
    id_of: dict[Hashable, str] = {}
    back: dict[str, Hashable] = {}
    for n in g.nodes:
        s = str(n)
        if s in back:  # collision (e.g. 0 and "0"): fall back to index
            s = f"#{len(id_of)}#{s}"
        id_of[n] = s
        back[s] = n

    edge_rows = [
        (id_of[u], id_of[v], _encode_attrs(attrs)) for u, v, attrs in g.edges(data=True)
    ]
    vert_rows = [(id_of[n], _encode_attrs(attrs)) for n, attrs in g.nodes(data=True)]
    edges = spark.createDataFrame(edge_rows, EDGE_SCHEMA)
    vertices = spark.createDataFrame(vert_rows, VERTEX_SCHEMA)
    host = HostGraph(edges, vertices, directed=directed, hint_small=hint_small)
    host.id_decoder = lambda s: back.get(s, s)
    host.id_encoder = lambda n: id_of.get(n, str(n))
    return host


def nx_to_motif(g) -> Motif:
    """Convert an nx motif, repr-encoding attrs to match host encoding."""
    import networkx as nx

    m = Motif(directed=isinstance(g, nx.DiGraph))
    for n, attrs in g.nodes(data=True):
        m.add_node(n, **_encode_attrs(attrs))
    for u, v, attrs in g.edges(data=True):
        m.add_edge(u, v, **_encode_attrs(attrs))
    return m
