"""Distributed link-graph data model.

The reference engine's "table" is an in-memory ``nx.Graph`` adjacency
dict (``/root/reference/grandiso/__init__.py:24``, ``:358``).  Here a
graph is a pair of DataFrames:

- ``edges(src, dst, attrs map<string,string>)`` — one row per stored
  edge.  Directed graphs store each arc once; undirected graphs store
  each edge once in either orientation (like an ``nx.Graph``).
- ``vertices(id, attrs map<string,string>)`` — optional; derived from
  edge endpoints when absent.  Needed explicitly only for isolated
  vertices or vertex attributes.

Everything the reference calls "fast" on an adjacency dict (degree,
out-neighbors, node attrs — ``grandiso/__init__.py:1-18``) becomes a
precomputed, persisted columnar artifact here: the degree table and
the symmetrized adjacency view.  Both are built once per graph and
reused across every round of every query on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def attrs_subset_predicate(attrs_col: Column, required: dict) -> Column:
    """Subset-equality semantics of the reference's attribute match.

    Every required key must be present with an equal value; extra host
    attributes are ignored; a missing key is a non-match
    (``grandiso/__init__.py:49-53`` nodes, ``:104-108`` edges).

    ``element_at`` returns NULL for a missing key and ``eqNullSafe``
    turns that NULL into False, so missing-key and wrong-value collapse
    into one null-safe comparison that Catalyst can push down.
    """
    pred = F.lit(True)
    for k, v in required.items():
        pred = pred & F.element_at(attrs_col, F.lit(str(k))).eqNullSafe(F.lit(str(v)))
    return pred


class HostGraph:
    """A host graph held as DataFrames, with cached derived artifacts.

    Parameters
    ----------
    edges:
        DataFrame with columns ``src``, ``dst`` and optionally ``attrs``.
    vertices:
        Optional DataFrame with columns ``id`` and optionally ``attrs``.
    directed:
        Storage directedness.  Undirected graphs store one row per edge.
    hint_small:
        If True, the graph is known to be tiny (unit-test fixtures) and
        join sides built from it are marked broadcastable.
    """

    def __init__(
        self,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        directed: bool = True,
        hint_small: bool = False,
    ) -> None:
        if "attrs" not in edges.columns:
            edges = edges.withColumn(
                "attrs", F.create_map().cast("map<string,string>")
            )
        # Native id type: integral endpoint columns stay integral
        # (canonicalized to long) — long join/shuffle keys hash faster
        # and pack 8 bytes fixed vs variable-width UTF8, a measurable
        # win on every expansion join at scale.  Anything else (string,
        # decimal, date, ...) canonicalizes to string, which also
        # covers mixed-type unions from nx fixtures.
        integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        if isinstance(edges.schema["src"].dataType, integral) and isinstance(
            edges.schema["dst"].dataType, integral
        ):
            self.id_type = "long"
        else:
            self.id_type = "string"
        self.edges = edges.select(
            F.col("src").cast(self.id_type).alias("src"),
            F.col("dst").cast(self.id_type).alias("dst"),
            F.col("attrs"),
        )
        self._explicit_vertices = vertices
        self.directed = directed
        self.hint_small = hint_small
        self._degrees: DataFrame | None = None
        self._vertices: DataFrame | None = None
        self._adjacency: DataFrame | None = None
        self._adjacency_deg: DataFrame | None = None
        self._persisted: list[DataFrame] = []

    # -- derived artifacts -------------------------------------------------

    @property
    def vertices(self) -> DataFrame:
        """All vertex ids with attrs (empty map when unknown)."""
        if self._vertices is None:
            endpoint_ids = (
                self.edges.select(F.col("src").alias("id"))
                .unionAll(self.edges.select(F.col("dst").alias("id")))
                .distinct()
            )
            if self._explicit_vertices is not None:
                ev = self._explicit_vertices
                if "attrs" not in ev.columns:
                    ev = ev.withColumn(
                        "attrs", F.create_map().cast("map<string,string>")
                    )
                ev = ev.select(
                    F.col("id").cast(self.id_type).alias("id"), F.col("attrs")
                )
                only_from_edges = endpoint_ids.join(ev, "id", "left_anti")
                verts = ev.unionByName(
                    only_from_edges.withColumn(
                        "attrs", F.create_map().cast("map<string,string>")
                    )
                )
            else:
                verts = endpoint_ids.withColumn(
                    "attrs", F.create_map().cast("map<string,string>")
                )
            self._vertices = self._persist(verts)
        return self._vertices

    @property
    def degrees(self) -> DataFrame:
        """Total degree per vertex: ``(id, degree)``.

        Matches ``nx.(Di)Graph.degree`` — the reference's structural
        prune uses *total* degree (``grandiso/__init__.py:78``): each
        stored edge contributes one to both endpoints, so directed
        total degree = in+out and a self-loop counts twice, in both
        modes.  One stacked scan + one aggregation, built once.
        """
        if self._degrees is None:
            stacked = self.edges.select(F.col("src").alias("id")).unionAll(
                self.edges.select(F.col("dst").alias("id"))
            )
            deg = stacked.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
            deg = (
                self.vertices.select("id")
                .join(deg, "id", "left")
                .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
            )
            self._degrees = self._persist(deg)
        return self._degrees

    @property
    def adjacency(self) -> DataFrame:
        """Directed adjacency rows used by traversals.

        Directed graphs: the edge table as-is.  Undirected graphs: the
        symmetrized table (both orientations, self-loops once), built
        once and persisted — the distributed analogue of ``host.adj``.
        """
        if self._adjacency is None:
            if self.directed:
                self._adjacency = self.edges
            else:
                sym = self.edges.unionAll(
                    self.edges.select(
                        F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                        "attrs",
                    )
                ).dropDuplicates(["src", "dst"])
                self._adjacency = self._persist(sym)
        return self._adjacency

    @property
    def adjacency_deg(self) -> DataFrame:
        """Adjacency rows with both endpoints' total degrees attached
        (``src, dst, attrs, src_deg, dst_deg``), built once, persisted.

        This turns the reference's per-candidate degree prune
        (``grandiso/__init__.py:58-78``, applied at every expansion
        step ``:287-289``) into a *filter inside the expansion join*
        instead of a per-round |frontier|-row semi-join: same pruning
        power, no extra join, no extra shuffle.
        """
        if self._adjacency_deg is None:
            deg = self.degrees
            adj = (
                self.adjacency.join(
                    deg.select(
                        F.col("id").alias("src"), F.col("degree").alias("src_deg")
                    ),
                    "src",
                )
                .join(
                    deg.select(
                        F.col("id").alias("dst"), F.col("degree").alias("dst_deg")
                    ),
                    "dst",
                )
                .select("src", "dst", "attrs", "src_deg", "dst_deg")
            )
            self._adjacency_deg = self._persist(adj)
        return self._adjacency_deg

    def candidate_domain(
        self,
        attrs: dict,
        min_degree: int,
        attr_pred: Column | None = None,
        structural_pred: Column | None = None,
    ) -> DataFrame:
        """Vertices passing the node-attr subset match and degree bound.

        This is the distributed replacement for the reference's
        memoized per-(motif,host)-pair predicates
        (``grandiso/__init__.py:29-78``): instead of caching per-row
        boolean calls we materialize the whole domain once per motif
        node and reuse it as a semi-join across every expansion round.
        Returns a single-column ``(id)`` DataFrame.

        ``attr_pred`` / ``structural_pred`` override the default
        subset-match / degree-lower-bound predicates (the P4 injection
        surface, ``grandiso/__init__.py:120-122``): Column expressions
        over ``attrs`` resp. ``degree`` of this graph's vertex/degree
        tables.
        """
        dom = self.vertices
        if attr_pred is not None:
            dom = dom.where(attr_pred)
        elif attrs:
            dom = dom.where(attrs_subset_predicate(F.col("attrs"), attrs))
        dom = dom.select("id")
        if structural_pred is not None:
            dom = dom.join(
                self.degrees.where(structural_pred).select("id"), "id", "left_semi"
            )
        elif min_degree > 0:
            dom = dom.join(
                self.degrees.where(F.col("degree") >= F.lit(min_degree)).select("id"),
                "id",
                "left_semi",
            )
        return dom

    # -- lifecycle ---------------------------------------------------------

    def encode_id(self, value):
        """Coerce a driver-side id literal (hint values) to this
        graph's native id type."""
        return int(value) if self.id_type == "long" else str(value)

    @property
    def id_spark_type(self) -> T.DataType:
        return T.LongType() if self.id_type == "long" else T.StringType()

    def _persist(self, df: DataFrame) -> DataFrame:
        df = df.persist()
        self._persisted.append(df)
        return df

    def unpersist(self) -> None:
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()
        self._degrees = None
        self._vertices = None
        self._adjacency = None
        self._adjacency_deg = None


def empty_edges(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], EDGE_SCHEMA)
