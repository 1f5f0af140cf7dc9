"""Neighborhood MinHash: approximate Jaccard similarity between vertex
neighborhoods, with banded LSH candidate generation.

The exact wedge-join link-prediction pass (`operators/linkpred.py`)
costs Σ deg² — at web scale a single 10⁷-degree hub makes that term
explode even with the hub guard.  This operator is the standard scale
path: per-vertex MinHash signatures of the neighbor set (Broder 1997),
banded into LSH buckets (Mining of Massive Datasets §3.4) so candidate
pairs only ever meet inside a bucket.

Determinism: signature position ``h`` of vertex ``v`` is EXACTLY

    sig_h(v) = min_{u in N(v)} md5_60bit(u | h | seed)

— a pure min-aggregate of portable hashes, so the whole signature
table is value-checkable bit-for-bit against a DuckDB replay (driver
check ``neighbor_minhash``), and ``P[sig_h(a) = sig_h(b)] =
J(N(a), N(b))`` gives the similarity estimate.

Scale shape:
- Signatures: ONE pass over the symmetrized edge list with H
  min-aggregates (map-side combine — a hub's 10⁷ neighbors reduce to
  H longs per partition; no per-vertex neighbor set ever
  materializes).
- Pairs: band key = md5 of the band's R signature values; self-join
  per band keyed on the band hash (work Σ|bucket|², never |V|²); the
  estimate is recomputed from full signatures on the surviving pairs
  only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import symmetrize


def _h(col: F.Column, h: int, seed: int) -> F.Column:
    from ..functions.hashing import hash60_keyed

    return hash60_keyed(col, F.lit(h), F.lit(seed))


def minhash_neighbor_signatures(
    edges: DataFrame,
    num_hashes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """``(id, sig0..sig{H-1} long)`` — MinHash signature of each
    vertex's (undirected) neighbor set.  Deterministic in
    (edge set, seed); vertices appear iff they have ≥1 neighbor."""
    sym = symmetrize(edges.where(F.col("src") != F.col("dst")))
    return sym.groupBy(F.col("src").alias("id")).agg(
        *[
            F.min(_h(F.col("dst"), h, seed)).alias(f"sig{h}")
            for h in range(num_hashes)
        ]
    )


def neighbor_similarity_pairs(
    edges: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """``(a, b, est_jaccard)`` — candidate vertex pairs sharing at
    least one LSH band, scored by the fraction of matching signature
    positions (an unbiased estimate of neighborhood Jaccard), filtered
    to ``est_jaccard >= threshold``.  ``num_hashes`` must be divisible
    by ``bands``."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sigs = minhash_neighbor_signatures(edges, num_hashes, seed)
    sig_cols = [f"sig{h}" for h in range(num_hashes)]
    banded = sigs.select(
        "id",
        *sig_cols,
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig{b * rows + r}").cast("string")
                        for r in range(rows)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(bands)
        ],
    ).localCheckpoint()
    # candidates meet only inside a band bucket
    cand = None
    for b in range(bands):
        left = banded.select(
            F.col("id").alias("a"),
            F.col(f"band{b}").alias("bk"),
            *[F.col(c).alias(f"a_{c}") for c in sig_cols],
        )
        right = banded.select(
            F.col("id").alias("b"),
            F.col(f"band{b}").alias("bk"),
            *[F.col(c).alias(f"b_{c}") for c in sig_cols],
        )
        p = left.join(right, "bk").where(F.col("a") < F.col("b"))
        cand = p if cand is None else cand.unionByName(p)
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0)
        for c in sig_cols
    )
    return (
        cand.select(
            "a", "b", (matches / F.lit(num_hashes)).alias("est_jaccard")
        )
        .distinct()
        .where(F.col("est_jaccard") >= threshold)
    )
