"""Deterministic R-MAT graph generator (Chakrabarti/Zhan/Faloutsos,
SDM'04) — the standard synthetic power-law graph source (Graph500
uses the same recursion) for benchmarking the engine at ANY scale
without input data: a 2^30-vertex, 10^10-edge stress graph is just a
``spark.range`` plus column expressions, generated in parallel on
every executor with no driver-side state.

Edge ``i`` descends ``scale`` levels of the adjacency-matrix
quadrant recursion; the level-``l`` draw is the engine's portable
hash ``u = hash60(i|l|seed) / 2^60`` and the quadrant thresholds are
the (a, b, c, d) R-MAT probabilities:

    u < a          -> (0, 0)      a + b + c + d = 1
    u < a + b      -> (0, 1)
    u < a + b + c  -> (1, 0)
    else           -> (1, 1)

Fully deterministic in (scale, n_edges, probs, seed) under any
partitioning/retry — and because the arithmetic is the portable md5
affine family, an independent DuckDB replay reproduces the edge list
BIT-FOR-BIT (driver value check ``rmat_edges``, the only generator in
the suite whose oracle needs no input table at all).

Self-loops and duplicate edges are emitted as drawn (standard R-MAT;
dedup downstream if a simple graph is needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import hash60_keyed

_TWO_POW_60 = float(1 << 60)


def rmat_edges(
    spark: SparkSession,
    scale: int = 10,
    n_edges: int | None = None,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    avg_degree: int = 8,
) -> DataFrame:
    """``(src long, dst long)`` — ``n_edges`` (default
    ``avg_degree · 2^scale``) R-MAT edges over ``2^scale`` vertices."""
    if scale < 1 or scale > 40:
        raise ValueError("scale must be in [1, 40]")
    d = 1.0 - a - b - c
    if min(a, b, c, d) < 0:
        raise ValueError("quadrant probabilities must be non-negative")
    m = n_edges if n_edges is not None else (1 << scale) * avg_degree
    e = spark.range(int(m)).withColumnRenamed("id", "i")
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        u = (
            hash60_keyed(F.col("i"), F.lit(level), F.lit(seed)).cast(
                "double"
            )
            / F.lit(_TWO_POW_60)
        )
        src_bit = F.when(u < a + b, F.lit(0)).otherwise(F.lit(1))
        dst_bit = (
            F.when(u < a, F.lit(0))
            .when(u < a + b, F.lit(1))
            .when(u < a + b + c, F.lit(0))
            .otherwise(F.lit(1))
        )
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    return e.select(src.alias("src"), dst.alias("dst"))
