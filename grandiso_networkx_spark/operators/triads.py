"""Triad census (extra op, beyond the north rule): counts of all 16
directed 3-vertex triad isomorphism classes — ``nx.triadic_census``
semantics over the simple digraph spanned by the edge table (vertex
set = edge endpoints; self-loops and parallel edges dropped).

The census is the aggregate companion to the motif engine: where
``find_motifs_df`` *enumerates* bindings for one motif
(reference semantics ``grandiso/__init__.py:113-342``), the census
*counts* every 3-vertex class at once — the standard social-network
structure fingerprint (Holland–Leinhardt) and a cheap global sanity
oracle for the motif counts (e.g. ``030C`` ×3 = directed-triangle
motif matches).

Scale shape (Batagelj–Mrvar re-expressed relationally):

1. **Canonical pair states** ``(a<b, f, r)`` — one ``groupBy`` over the
   edge table; every later stage works on pairs, never raw edges.
2. **Connected triples** (≥2 linked pairs) via a pair–pair self-join on
   the shared vertex — work Σdeg² like every wedge operator here
   (linkpred, two-hop); triples carrying all three pair states via
   three equi joins back against the pair table.
3. **Tricode classification**: the 6 arc-presence bits index networkx's
   64→16 tricode table, embedded as a literal CASE map — pure column
   expressions, provably the same mapping pytest checks against
   ``nx.triadic_census`` on random digraphs.
4. **Disconnected classes by subtraction** — never enumerated:
   per linked pair the count of third vertices adjacent to neither is
   ``n − deg(a) − deg(b) + common(a,b)`` (inclusion–exclusion over the
   undirected neighborhoods, both degrees counting the partner), with
   ``common`` from one wedge join; ``012``/``102`` sum that over
   asymmetric/mutual pairs, ``003`` is the complement vs C(n,3).

Output: exactly 16 rows ``(triad string, n_triads long)``, zero-filled.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

# networkx's tricode tables (Holland–Leinhardt classes): bit b of the
# code = presence of one of the 6 possible arcs among the sorted triple
# (u<v<w): u→v:1, v→u:2, u→w:4, w→u:8, v→w:16, w→v:32.
TRIAD_NAMES = (
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
)
TRICODES = (
    1, 2, 2, 3, 2, 4, 6, 8, 2, 6, 5, 7, 3, 8, 7, 11, 2, 6, 4, 8, 5, 9,
    9, 13, 6, 10, 9, 14, 7, 14, 12, 15, 2, 5, 6, 7, 6, 9, 10, 14, 4, 9,
    9, 12, 8, 13, 14, 15, 3, 7, 8, 11, 7, 12, 14, 15, 8, 14, 13, 15,
    11, 15, 15, 16,
)


def _pair_states(edges: DataFrame) -> DataFrame:
    """Canonical linked pairs ``(a < b, f, r)``: f = a→b arc exists,
    r = b→a arc exists (ints 0/1; at least one is 1 per row)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("__f"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("__r"),
        )
        .groupBy("a", "b")
        .agg(F.max("__f").alias("f"), F.max("__r").alias("r"))
    )


def triad_census(edges: DataFrame) -> DataFrame:
    """``(triad, n_triads)`` — all 16 classes, ``nx.triadic_census``
    values over the digraph spanned by the edge table."""
    pairs = _pair_states(edges).persist()

    # -- connected triples (>= 2 linked pairs), sorted u < v < w ------
    i1 = reduce(
        DataFrame.unionAll,
        [
            pairs.select(F.col("a").alias("s"), "a", "b"),
            pairs.select(F.col("b").alias("s"), "a", "b"),
        ],
    )
    i2 = i1.select(
        F.col("s"),
        F.col("a").alias("a2"),
        F.col("b").alias("b2"),
    )
    raw = i1.join(i2, "s").where(
        (F.col("a") < F.col("a2"))
        | ((F.col("a") == F.col("a2")) & (F.col("b") < F.col("b2")))
    )
    o1 = F.when(F.col("a") == F.col("s"), F.col("b")).otherwise(F.col("a"))
    o2 = F.when(F.col("a2") == F.col("s"), F.col("b2")).otherwise(F.col("a2"))
    lo = F.least(F.col("s"), o1, o2)
    hi = F.greatest(F.col("s"), o1, o2)
    mid = (
        F.when((F.col("s") > lo) & (F.col("s") < hi), F.col("s"))
        .when((o1 > lo) & (o1 < hi), o1)
        .otherwise(o2)
    )
    triples = (
        raw.where(o1 != o2)
        .select(lo.alias("u"), mid.alias("v"), hi.alias("w"))
        .dropDuplicates(["u", "v", "w"])
    )

    # -- three pair-state lookups -> 6-bit tricode -> class name ------
    def _st(u, v, fa, ra):
        return pairs.select(
            F.col("a").alias(u),
            F.col("b").alias(v),
            F.col("f").alias(fa),
            F.col("r").alias(ra),
        )

    coded = (
        triples.join(_st("u", "v", "fuv", "ruv"), ["u", "v"], "left")
        .join(_st("u", "w", "fuw", "ruw"), ["u", "w"], "left")
        .join(_st("v", "w", "fvw", "rvw"), ["v", "w"], "left")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    code = (
        z("fuv") * 1 + z("ruv") * 2 + z("fuw") * 4
        + z("ruw") * 8 + z("fvw") * 16 + z("rvw") * 32
    )
    name = F.element_at(
        F.array(*[F.lit(TRIAD_NAMES[t - 1]) for t in TRICODES]), code + 1
    )
    connected = (
        coded.select(name.alias("triad"))
        .groupBy("triad")
        .agg(F.count(F.lit(1)).alias("n_triads"))
    )

    # -- disconnected classes by subtraction --------------------------
    und = reduce(
        DataFrame.unionAll,
        [
            pairs.select(F.col("a").alias("x"), F.col("b").alias("y")),
            pairs.select(F.col("b").alias("x"), F.col("a").alias("y")),
        ],
    )
    deg = und.groupBy(F.col("x").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    common = (
        und.select(F.col("x").alias("a"), F.col("y").alias("c"))
        .join(und.select(F.col("x").alias("b"), F.col("y").alias("c")), "c")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nv = deg.agg(F.count(F.lit(1)).alias("n"))
    per_pair = (
        pairs.join(common, ["a", "b"], "left")
        .join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .crossJoin(F.broadcast(nv))
        .select(
            (F.col("f") + F.col("r")).alias("kind"),
            (
                F.col("n") - F.col("da") - F.col("db")
                + F.coalesce(F.col("cn"), F.lit(0))
            ).alias("thirds"),
        )
    )
    lonely = (
        per_pair.groupBy()
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("kind") == 1, F.col("thirds"))), F.lit(0)
            ).alias("n012"),
            F.coalesce(
                F.sum(F.when(F.col("kind") == 2, F.col("thirds"))), F.lit(0)
            ).alias("n102"),
        )
    )
    dis = lonely.select(
        F.explode(
            F.array(
                F.struct(F.lit("012").alias("triad"), F.col("n012").alias("n_triads")),
                F.struct(F.lit("102").alias("triad"), F.col("n102").alias("n_triads")),
            )
        ).alias("s")
    ).select("s.triad", "s.n_triads")

    counted = connected.unionByName(dis).groupBy("triad").agg(
        F.sum("n_triads").alias("n_triads")
    )
    total = nv.select(
        F.expr("CAST((n * (n - 1) * (n - 2)) DIV 6 AS LONG)").alias(
            "n_triples"
        )
    )
    all_names = edges.sparkSession.createDataFrame(
        [(t,) for t in TRIAD_NAMES], "triad string"
    )
    filled = all_names.join(counted, "triad", "left").select(
        "triad", F.coalesce("n_triads", F.lit(0)).alias("n_triads")
    )
    rest = filled.where(F.col("triad") != "003").agg(
        F.coalesce(F.sum("n_triads"), F.lit(0)).alias("rest")
    )
    out = filled.crossJoin(F.broadcast(total)).crossJoin(F.broadcast(rest)).select(
        "triad",
        F.when(
            F.col("triad") == "003", F.col("n_triples") - F.col("rest")
        )
        .otherwise(F.col("n_triads"))
        .cast("long")
        .alias("n_triads"),
    )
    return out
