"""Weisfeiler–Lehman color refinement: iterated neighborhood-structure
fingerprints per vertex + a whole-graph hash — the classic
isomorphism-invariant signature (1-WL), the cheap pre-filter a motif/
isomorphism engine runs before exact search (two graphs with different
WL hashes CANNOT be isomorphic; the reference's exact matcher is the
confirm step), and the theoretical ceiling of message-passing GNN
expressiveness (Xu et al., ICLR'19).

Refinement rule (pinned; mirrored by the python test oracle and the
DuckDB driver oracle ``wl_colors``):

    color_0(v)   = md5_60bit("init|" + deg(v))
    color_{t+1}(v) = md5_60bit(color_t(v) "|" M_t(v))
    M_t(v)       = Σ_{u ∈ N(v)} md5_60bit("nbr|" + color_t(u))  mod 2^61

The textbook rule hashes the SORTED neighbor color list; collecting a
hub's 10⁷ colors into one array is exactly the anti-pattern this
engine avoids, so the multiset is combined with a commutative modular
SUM of per-color hashes instead — equal multisets give equal sums
(refinement never splits less than textbook WL on equal multisets);
unequal multisets collide with probability ~2⁻⁶¹ per comparison.
Everything is the engine's portable md5 arithmetic: bit-for-bit
SQL-replayable, retry/partitioning-stable.

Scale shape: per round ONE state ⋈ edges equi join +
``groupBy(v).sum`` (map-side combine absorbs hub fan-in — the reason
for the sum combiner), then a projection; the graph hash is a second
sum over the color histogram.  O(rounds·E) total, like every gather
pass in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

from .components import symmetrize

_MOD = 1 << 61


def _h(col: F.Column) -> F.Column:
    from ..functions.hashing import hash60

    return hash60(col)


def wl_colors(
    edges: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """``(id, color long)`` — 1-WL colors after ``rounds`` refinements
    over the simple undirected graph (self-loops dropped).  Vertices
    with identical ``color`` have indistinguishable ≤``rounds``-hop
    neighborhoods under 1-WL."""
    sym = symmetrize(
        edges.where(F.col("src") != F.col("dst"))
    ).localCheckpoint()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    state = deg.select(
        "id",
        _h(F.concat_ws("|", F.lit("init"), F.col("deg"))).alias("color"),
    ).localCheckpoint()
    for _ in range(rounds):
        contrib = (
            sym.join(
                state.select(
                    F.col("id").alias("dst"),
                    _h(
                        F.concat_ws("|", F.lit("nbr"), F.col("color"))
                    ).alias("nh"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            # accumulate in DECIMAL(38,0): a hub's 10^7 x 2^60 terms
            # overflow BIGINT, and the mod must come after an exact sum
            .agg(
                (
                    F.sum(F.col("nh").cast("decimal(38,0)"))
                    % F.lit(_MOD)
                )
                .cast("long")
                .alias("m")
            )
        )
        state = (
            state.join(contrib, "id")
            .select(
                "id",
                _h(F.concat_ws("|", F.col("color"), F.col("m"))).alias(
                    "color"
                ),
            )
            .transform(flat_checkpoint)
        )
    return state


def wl_graph_hash(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """1-row ``(wl_hash long)`` — order-independent hash of the final
    color histogram; isomorphic graphs ALWAYS agree, non-isomorphic
    graphs disagree whenever 1-WL can tell them apart."""
    colors = wl_colors(edges, rounds)
    hist = colors.groupBy("color").agg(F.count(F.lit(1)).alias("n"))
    return hist.agg(
        (
            F.sum(
                _h(F.concat_ws("|", F.col("color"), F.col("n"))).cast(
                    "decimal(38,0)"
                )
            )
            % F.lit(_MOD)
        )
        .cast("long")
        .alias("wl_hash")
    )
