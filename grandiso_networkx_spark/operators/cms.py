"""Count–min sketch: fixed-size frequency summary of an unbounded key
stream (Cormode & Muthukrishnan 2005) + heavy-hitter extraction — the
"novel sketch" class of custom operator: when the key cardinality is
too large to hold exact counts (10¹¹ distinct n-grams / URLs), a
d×w counter grid bounds memory at d·w cells with one-sided error
(estimates only ever overcount, by ≤ εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

Determinism: cell ``(r, c)`` accumulates keys with
``md5_60bit(key|r|seed) % w == c`` — the engine's portable hash, so
the ENTIRE sketch (all d·w cells) is value-checkable bit-for-bit
against a DuckDB replay (driver check ``cms_sketch``), and sketches
built on different partitions/engines merge by cell-wise addition.

Scale shape: building is ONE ``groupBy(row, cell)`` over d copies of
the stream (an explode by d, map-side combine collapses each
partition to ≤ d·w rows regardless of input size); querying keys is a
d-way min over d equi-joined cell lookups.  No collect, no per-row
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cell(col: F.Column, r: int, seed: int, width: int) -> F.Column:
    from ..functions.hashing import hash60_keyed

    return F.pmod(hash60_keyed(col, F.lit(r), F.lit(seed)), F.lit(width))


def cms_build(
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """``(r, c, n)`` — the d×w counter grid over the key stream (one
    input row = one occurrence); only nonzero cells appear."""
    rows = None
    k = F.col(key_col).cast("string")
    for r in range(depth):
        part = keys.select(
            F.lit(r).alias("r"), _cell(k, r, seed, width).alias("c")
        )
        rows = part if rows is None else rows.unionAll(part)
    return rows.groupBy("r", "c").agg(F.count(F.lit(1)).alias("n"))


def cms_query(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """``(key, est)`` — count–min estimate (min over the d cells) for
    each candidate key; never undercounts the true frequency."""
    k = F.col(key_col).cast("string")
    cand = candidates.select(k.alias("key")).distinct()
    probes = None
    for r in range(depth):
        p = cand.select(
            "key",
            F.lit(r).alias("r"),
            _cell(F.col("key"), r, seed, width).alias("c"),
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(sketch, ["r", "c"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    keys: DataFrame,
    key_col: str = "key",
    min_share: float = 0.01,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """``(key, est, share)`` — keys whose estimated frequency is at
    least ``min_share`` of the stream, scored by the sketch.

    The candidate set is the distinct keys (exact in this single-pass
    formulation; in a true bounded-memory deployment candidates come
    from a coarse pre-filter or prior window — the sketch math is
    identical).  One-sided error: false positives possible near the
    threshold, never false negatives."""
    sketch = cms_build(keys, key_col, depth, width, seed)
    total = keys.count()
    if total == 0:
        raise ValueError("empty key stream")
    est = cms_query(
        sketch, keys.select(key_col), key_col, depth, width, seed
    )
    return (
        est.withColumn("share", F.col("est") / F.lit(float(total)))
        .where(F.col("share") >= min_share)
    )
