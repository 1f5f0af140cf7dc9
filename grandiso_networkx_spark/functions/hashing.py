"""The engine's portable 60-bit hash — THE cross-engine determinism
primitive every deterministic operator builds on (Luby priorities,
walk draws, MinHash/SimHash/CMS cells, WL colors, FM registers,
sampling buckets, dataset splits).

    hash60(col)            = conv(substr(md5(col), 1, 15), 16, 10) :: long
    hash60_keyed(a, b, …)  = hash60(concat_ws('|', a, b, …))

Identical in ANSI SQL / DuckDB as

    CAST('0x' || substring(md5(expr), 1, 15) AS BIGINT)

— 15 hex chars = 60 bits, always non-negative, no engine-specific
hash function anywhere — which is what makes every portable-hash
operator value-checkable bit-for-bit against an independent DuckDB
replay, and stable under any partitioning / retry / re-run.

This is the single definition point: a portability change here (hex
width, cast, separator) must land together with the matching change
in every SQL oracle in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash60(col: Column) -> Column:
    """Portable 60-bit md5 hash of a (string) column."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    )


def hash60_keyed(*cols) -> Column:
    """``hash60`` of the '|'-joined key parts (columns or literals
    already wrapped as Columns).

    PRECONDITION — all key parts must be NON-NULL.  ``concat_ws``
    silently *drops* null parts, so ``hash60_keyed(a, NULL, b) ==
    hash60_keyed(a, b)`` (cross-key collisions), and it diverges from
    a naive ``'||'`` SQL replay where any NULL nulls the whole key.
    Every internal caller feeds literals, generated ids, or
    already-coalesced columns; external callers hashing nullable data
    must ``F.coalesce(col, F.lit(sentinel))`` each part FIRST, with
    the same sentinel applied in any SQL oracle.  (Kept as a
    documented precondition rather than a per-row assert: this hash
    sits in the innermost loop of every deterministic operator, and a
    null-check expression per part would tax all of them to guard a
    misuse none of them can make.)"""
    return hash60(F.concat_ws("|", *cols))
