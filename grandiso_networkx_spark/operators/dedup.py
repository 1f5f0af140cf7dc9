"""Document deduplication operators for large-scale training-data
pipelines (task-mandated additions beyond the reference's surface).

All four families work over a ``documents(doc_id, text, ...)`` table:

- **exact**: hash-groupBy on a content digest — one shuffle, the md5
  keeps the shuffle key narrow regardless of document length.
- **MinHash + LSH**: shingle → minhash signature (one vectorized Arrow
  kernel) → band buckets → bucket self-join.  Candidate pairs only ever
  meet inside a bucket, so the join is |bucket|²-local instead of n².
- **SimHash**: 64-bit fingerprint; near-dups collide on rotated prefix
  bands.
- **n-gram Jaccard**: exact verification on LSH candidates (or small
  inputs) via explode + pair aggregation.

Everything JVM-side by default (the MinHash default is the portable
md5-affine family — pure column expressions); the alternative numpy
MinHash kernel is a single batch-vectorized `mapInPandas` pass with
no per-document Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# -- exact ------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(h, n_dups, keep_id)`` — one row per distinct content hash."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the min-doc_id representative of each exact-duplicate set."""
    keep = exact_duplicates(docs, text_col).select(
        F.col("keep_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def passage_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str | None = None,
    window: int = 20,
) -> DataFrame:
    """Passage-level exact dedup (the C4/Gopher-style boilerplate
    remover): split each document into passages, keep only the FIRST
    corpus-wide occurrence of each distinct passage (first = min
    ``(doc_id, pos)``), and reassemble the surviving text in original
    order.

    ``delimiter`` splits on a literal separator (paragraph breaks);
    ``None`` falls back to fixed non-overlapping ``window``-word
    chunks — the corpora here are single-line word streams.  Window
    mode only collapses ALIGNED repeats (a passage starting mid-chunk
    hashes differently); delimiter mode has no such offset
    sensitivity, and unaligned near-repeats are the MinHash/winnowing
    operators' job.

    Returns ``(doc_id, n_passages, n_kept, text_dedup)`` for EVERY
    input document (a doc whose passages are all boilerplate keeps an
    empty string).

    Scale shape: the only corpus-wide meeting point is the
    ``groupBy(passage)`` min-owner aggregation — map-side combine
    collapses a boilerplate passage shared by 10⁶ docs to one row per
    map partition, so there is no hot-key reducer (the reason this is
    a groupBy + semi-join rather than a row_number window over the
    passage partition).  Split/reassemble are per-document built-ins
    (no Python).
    """
    if delimiter is not None:
        passages = F.split(F.col(text_col), F.lit(delimiter), -1)
    else:
        toks = F.split(F.col(text_col), " ")
        n_chunks = F.greatest(
            F.ceil(F.size(toks) / F.lit(window)).cast("int"), F.lit(1)
        )
        passages = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * window + 1, window), " "
            ),
        )
    p = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(passages).alias("pos", "passage")
    )
    owner = p.groupBy("passage").agg(
        F.min(F.struct("doc_id", "pos")).alias("__first")
    )
    kept = p.join(owner, "passage").where(
        (F.col("doc_id") == F.col("__first.doc_id"))
        & (F.col("pos") == F.col("__first.pos"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "passage"))),
                lambda s: s["passage"],
            ),
            " " if delimiter is None else delimiter,
        ).alias("text_dedup"),
    )
    totals = p.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_passages"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_passages", F.lit(0)).alias("n_passages"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def near_dedup_keep(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Turn a near-duplicate *pair* table into a keep/drop decision.

    Near-dup relations are not transitive, but dedup policies treat
    them as if they were (a≈b and b≈c ⇒ drop all but one of {a,b,c}),
    so the equivalence classes are the connected components of the
    pair graph — computed with the engine's own HashMin pass, which
    composes here because its ``min``-label contract is type-generic.
    The representative kept is the smallest id in each class.

    Returns ``(id_col, keep_id, is_dup)`` covering EVERY input doc
    (docs in no pair keep themselves).  Scale shape: the pair table is
    sparse output of a bucketed join (winnowing / MinHash-LSH), the
    component pass is O(pair-diameter) rounds of narrow-key shuffles,
    and the final left join is doc-partitioned — nothing quadratic.
    """
    e = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    from .components import connected_components

    comp = connected_components(e).withColumnRenamed("id", id_col)
    keep = F.coalesce("component", F.col(id_col))
    return docs.select(id_col).join(comp, id_col, "left").select(
        id_col,
        keep.alias("keep_id"),
        (keep != F.col(id_col)).alias("is_dup"),
    )


# -- minhash + LSH ----------------------------------------------------------

_MERSENNE = (1 << 61) - 1

# Portable-hash family: every primitive below is expressible verbatim in
# ANSI-ish SQL (DuckDB), so pipelines built on it are value-checkable
# end-to-end against an independent engine.  Production keeps the faster
# xxhash64/numpy family; quality is equivalent (both are uniform hashes).
_PORTABLE_P = (1 << 31) - 1  # Mersenne modulus for the affine permutations


def _portable_params(num_perm: int, seed: int) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation params from a pure-Python LCG —
    embedded as literals in BOTH the Spark plan and the SQL oracle."""
    x = (seed & 0x7FFFFFFF) or 1
    a: list[int] = []
    b: list[int] = []
    for _ in range(num_perm):
        x = (1103515245 * x + 12345) % (1 << 31)
        a.append(x % (_PORTABLE_P - 1) + 1)
        x = (1103515245 * x + 12345) % (1 << 31)
        b.append(x % _PORTABLE_P)
    return a, b


def _char_shingles(text_col, shingle_k: int):
    """array<string> of character k-grams (the whole text if shorter),
    1-based substr semantics shared by Spark and DuckDB."""
    t = F.coalesce(text_col, F.lit(""))
    n = F.greatest(F.length(t) - (shingle_k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substr(t, i, F.lit(shingle_k))
    )


def _portable_hash28(col):
    """28-bit portable string hash: first 7 hex chars of md5, both
    engines parse the same hex → identical longs."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def _portable_hash60(col):
    """60-bit variant (15 hex chars — stays inside signed BIGINT)."""
    from ..functions.hashing import hash60

    return hash60(col)


def portable_minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """``(doc_id, sig array<long>)`` — MinHash with the portable hash
    family, entirely JVM-side column expressions (no Python at all):
    sig[i] = min over shingles s of (a_i * h28(s) + b_i) mod (2^31-1).

    h28 < 2^28 and a_i < 2^31 keep every product inside a signed 64-bit
    long on both engines — no overflow-semantics divergence.

    Shape: explode shingles → hash ONCE per shingle → groupBy(doc_id)
    with num_perm min-aggregates.  Catalyst does not CSE a shingle-hash
    expression across num_perm higher-order-function lambdas, so the
    one-row-per-doc array formulation pays num_perm× the md5 cost; the
    explode pays it once, and map-side partial aggregation collapses
    each doc back to one row per partition before the shuffle."""
    a, b = _portable_params(num_perm, seed)
    exploded = docs.select(
        "doc_id",
        F.explode(_char_shingles(F.col(text_col), shingle_k)).alias("__s"),
    ).select("doc_id", _portable_hash28(F.col("__s")).alias("__h"))
    aggs = [
        F.min(
            F.pmod(F.col("__h") * F.lit(ai) + F.lit(bi), F.lit(_PORTABLE_P))
        ).alias(f"__m{i}")
        for i, (ai, bi) in enumerate(zip(a, b))
    ]
    return (
        exploded.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[f"__m{i}" for i in range(num_perm)]).alias("sig"),
        )
    )


_POLY = np.uint64(1000003)  # FNV-ish odd multiplier for the byte hash


def _minhash_kernel(num_perm: int, shingle_k: int, seed: int):
    """Batch-vectorized MinHash: the whole Arrow batch is one numpy
    computation — encode, byte-shingle via ``sliding_window_view``,
    polynomial-hash every window in ``k`` vectorized passes, then one
    ``np.minimum.reduceat`` per permutation over the ragged per-doc
    segments.  No per-document Python loop anywhere (the only Python
    iteration is over the ``num_perm`` permutations and the ``k``
    bytes of the window hash, both batch-wide vector ops), and no
    ``hash()`` — signatures are PYTHONHASHSEED-independent.

    Hash domain: 31-bit (mod 2^31-1) so ``a*h + b`` stays below 2^62
    inside uint64 — same overflow discipline as the portable family.
    """
    p31 = np.uint64(_PORTABLE_P)
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _PORTABLE_P, size=num_perm).astype(np.uint64)
    b = rng.randint(0, _PORTABLE_P, size=num_perm).astype(np.uint64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": []})
                continue
            # Pad short texts to k chars (utf-8 length >= char length),
            # so every doc owns >= 1 window — required by reduceat and
            # matches "whole text is the shingle" semantics for shorts.
            texts = pdf["text"].fillna("").str.ljust(shingle_k, "\x00")
            enc = texts.str.encode("utf-8")
            lens = enc.str.len().to_numpy(np.int64)
            buf = np.frombuffer(
                b"".join(enc.tolist()) + b"\x00" * (shingle_k - 1),
                dtype=np.uint8,
            )
            offs = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            # Hash EVERY k-byte window of the concatenated buffer...
            win = np.lib.stride_tricks.sliding_window_view(buf, shingle_k)
            h = np.zeros(win.shape[0], np.uint64)
            for j in range(shingle_k):
                h = h * _POLY + win[:, j]
            h %= p31
            # ...then keep only windows fully inside a document
            # (ragged-range gather: doc i owns positions
            # offs[i] .. offs[i] + len_i - k).
            counts = lens - shingle_k + 1
            cc = np.cumsum(counts)
            seg = cc - counts
            idx = (
                np.arange(cc[-1], dtype=np.int64)
                - np.repeat(seg, counts)
                + np.repeat(offs[:-1], counts)
            )
            hv = h[idx]
            sig = np.empty((len(lens), num_perm), np.int64)
            for k in range(num_perm):
                sig[:, k] = np.minimum.reduceat(
                    (hv * a[k] + b[k]) % p31, seg
                ).astype(np.int64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sig": list(sig)}
            )

    return kernel


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 128,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """``(doc_id, sig array<long>)`` MinHash signatures — the numpy
    fast path (one vectorized Arrow batch kernel, see
    :func:`_minhash_kernel`).  Deterministic for a given seed across
    runs, sessions, and PYTHONHASHSEED values.  The SQL-replayable
    twin is :func:`portable_minhash_signatures` (all-JVM, value-checked
    against DuckDB), which is also the :func:`minhash_lsh_pairs`
    default.
    """
    sel = docs.select("doc_id", F.col(text_col).alias("text"))
    return sel.mapInPandas(
        _minhash_kernel(num_perm, shingle_k, seed),
        schema="doc_id long, sig array<long>",
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    portable: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs ``(a, b, est_jaccard)``.

    Bands of ``num_perm/bands`` rows; documents sharing any band bucket
    become candidates; estimated Jaccard = fraction of matching minhash
    positions; filtered at ``threshold``.

    ``max_bucket_size`` (r5): hot-bucket guard for the band self-join,
    the analogue of :func:`ngram_jaccard_pairs`' ``max_df`` stop-gram
    cap.  Candidate work is Σ|bucket|² — one degenerate band bucket
    (e.g. 10⁶ boilerplate docs that survived exact dedup because of a
    one-char footer diff) is 10¹² pairs on its own.  With the cap set,
    buckets larger than ``max_bucket_size`` are dropped from THAT band
    (the doc stays a candidate through its other ``bands-1`` buckets).
    Explicit recall contract: a pair is missed iff **every** band it
    collides in is degenerate — near-identical boilerplate families
    above the cap, exactly the mass an exact/passage dedup pass should
    have removed first.  Default ``None`` preserves exhaustive
    candidate generation (the value-checked oracle configuration).

    The DEFAULT signature family is the portable md5-affine one —
    entirely JVM-side column expressions (zero Python in the hot path)
    and SQL-expressible, so the default pipeline is value-checked
    end-to-end against DuckDB by the driver (``minhash_portable_pairs``).
    ``portable=False`` switches to the numpy Arrow-batch kernel
    (:func:`minhash_signatures`) — batch-vectorized, useful when the
    corpus is already flowing through a Python stage; quality is
    equivalent (both families are uniform hashes).
    """
    rows_per_band = num_perm // bands
    if portable:
        sigs = portable_minhash_signatures(
            docs, text_col, num_perm, shingle_k, seed
        ).persist()
    else:
        sigs = minhash_signatures(docs, text_col, num_perm, shingle_k, seed).persist()

    def _bucket(i: int):
        sl = F.slice("sig", i * rows_per_band + 1, rows_per_band)
        if portable:
            return F.md5(F.concat_ws(",", sl.cast("array<string>")))
        return F.xxhash64(sl.cast("array<string>").cast("string"))

    band_cols = [
        F.struct(F.lit(i).alias("band"), _bucket(i).alias("bucket"))
        for i in range(bands)
    ]
    # The band self-join carries IDS ONLY — never the signatures.  The
    # bucket frame is |docs|·bands rows; dragging the num_perm-long sig
    # arrays through it multiplies shuffle bytes by the signature width
    # AND mis-feeds the join-side size estimator (arrays are badly
    # underestimated → Spark broadcast-builds a multi-hundred-MB side
    # and dies on maxResultSize — observed live at num_perm=256 on a
    # 200k-doc corpus).  Signatures re-attach AFTER the candidate
    # dedup, one |pairs|-row equi join per side against the persisted
    # |docs|-row sig frame.
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "bk.band", "bk.bucket")
    if max_bucket_size is not None:
        from pyspark.sql import Window

        # One count-over-window partitioned by the join keys: the
        # exchange it introduces is the same hash partitioning the
        # sort-merge band join needs, so the guard adds no extra
        # shuffle of the ids frame — just the per-bucket count.
        w = Window.partitionBy("band", "bucket")
        buckets = (
            buckets.withColumn("__bsz", F.count("*").over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    left = buckets.select("band", "bucket", F.col("doc_id").alias("a"))
    right = buckets.select("band", "bucket", F.col("doc_id").alias("b"))
    pairs = (
        # the self-join is hinted too: its |docs|·bands build side is
        # estimator-invisible (derived through the same aggregate), and
        # a broadcast build would compute the whole signature pass
        # inside the broadcast thread — the same two failure modes as
        # the re-attach joins below, measured live at 700k docs
        left.join(right.hint("merge"), ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
        # The re-attach joins are hinted sort-merge: Catalyst's size
        # estimate for the aggregate-derived sig frame ignores the
        # array payload (num_perm longs/row), so left to itself it
        # broadcast-builds this side — ~700MB shipped at 700k docs
        # (maxResultSize death), and the 128-min aggregate computes
        # INSIDE the 300s broadcast thread (timeout on small
        # executors; both observed live).  SMJ on the id key is the
        # correct unconditional strategy at any corpus size.
        .join(
            sigs.select(
                F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")
            ).hint("merge"),
            "a",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")
            ).hint("merge"),
            "b",
        )
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_perm))
    out = pairs.select("a", "b", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )
    return out


# -- simhash ----------------------------------------------------------------


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 4,
    portable: bool = False,
) -> DataFrame:
    """``(doc_id, simhash long)`` — 64-bit SimHash over character
    shingles, entirely JVM-side: shingles via ``sequence``+``transform``,
    per-bit majority vote via bitwise aggregation expressions.

    ``portable=True`` swaps the per-shingle xxhash64 for the 60-bit
    md5-hex hash (SQL-expressible → driver value-checks against DuckDB);
    the fingerprint then carries 60 informative bits, top 4 zero.

    Shape: explode shingles → hash ONCE per shingle → groupBy(doc_id)
    with one signed-tally sum per bit (bit set ? +1 : -1), then
    assemble the code from the tally signs.  The one-row-per-doc
    formulation (aggregate over a shingle array, one pass per bit)
    recomputes the shingle hash `bits`× because Catalyst does not CSE
    across higher-order-function lambdas — measured 60× slower."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n = F.greatest(F.length(t) - (shingle_k - 1), F.lit(1))
    bits = 60 if portable else 64

    def _hash(s):
        return _portable_hash60(s) if portable else F.xxhash64(s)

    shingles = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substr(t, i, F.lit(shingle_k))
    )
    exploded = docs.select(
        "doc_id", F.explode(shingles).alias("__s")
    ).select("doc_id", _hash(F.col("__s")).alias("__h"))

    def _mask(bit: int) -> int:
        return 1 << bit if bit < 63 else -(1 << 63)

    tallies = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.col("__h").bitwiseAND(F.lit(_mask(b)).cast("long")) != 0, 1
                ).otherwise(-1)
            ).alias(f"__t{b}")
            for b in range(bits)
        ]
    )
    code = F.lit(0).cast("long")
    for bit in range(bits):
        code = code.bitwiseOR(
            F.when(
                F.col(f"__t{bit}") > 0, F.lit(_mask(bit)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    return tallies.select("doc_id", code.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    prefix_bits: int = 16,
    portable: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs by banded SimHash prefixes + exact
    Hamming filter (``bit_count(a XOR b) <= max_hamming``).

    ``portable`` selects the fingerprint family (see :func:`simhash`);
    with the portable family the whole pipeline — fingerprint, band
    keys, Hamming filter — is SQL-replayable bit-for-bit.

    ``max_bucket_size`` (r5): hot-bucket guard — prefix buckets larger
    than the cap are dropped from that rotation before the Σ|bucket|²
    self-join (the doc keeps its other ``rotations-1`` buckets).  Same
    recall contract as :func:`minhash_lsh_pairs`: a pair is missed iff
    every shared prefix bucket is degenerate.  Default ``None`` is
    exhaustive (the value-checked configuration)."""
    sh = simhash(docs, text_col, portable=portable).persist()
    rotations = 64 // prefix_bits
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * prefix_bits)
                        .bitwiseAND(F.lit((1 << prefix_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(rotations)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key")
        bands = (
            bands.withColumn("__bsz", F.count("*").over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    l = bands.select("band", "key", F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    r = bands.select("band", "key", F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    return (
        l.join(r, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming)
        .select("a", "b")
    )


# -- n-gram jaccard ---------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for all pairs sharing at
    least one n-gram: ``(a, b, jaccard)``.

    explode → gram-pair join → |A∩B| per pair; |A| via per-doc distinct
    counts.  The gram self-join is Σ|bucket|², so ``max_df`` drops
    *stop-grams* — n-grams occurring in more than that many documents
    (boilerplate) — the same hot-bucket guard as
    :func:`~.textstats.winnow_near_pairs`: without it one gram shared
    by 10^6 docs is a 10^12-row bucket.  The guard is applied to the
    WHOLE computation (sizes and intersections), so the score stays an
    exact Jaccard over the filtered gram sets — SQL-replayable with a
    plain ``HAVING``.  ``max_df=None`` disables it (exact full-corpus
    semantics; only for small inputs or pre-bucketed LSH candidates).
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    grams = (
        docs.select("doc_id", F.explode(F.array_distinct(grams_arr)).alias("gram"))
        .persist()
    )
    if max_df is not None:
        keep = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("gram")
        )
        grams = grams.join(keep, "gram")
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    l = grams.select(F.col("doc_id").alias("a"), "gram")
    r = grams.select(F.col("doc_id").alias("b"), "gram")
    inter = (
        l.join(r, "gram")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_grams").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_grams").alias("nb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def ngram_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> DataFrame:
    """Asymmetric near-dup detection: word-n-gram **containment**
    ``C = |A∩B| / min(|A|,|B|)`` for all pairs sharing a gram —
    ``(a, b, containment)`` with ``a < b`` and ``containment >= threshold``.

    Jaccard (:func:`ngram_jaccard_pairs`) misses the quote-inside-an-
    article case: a 100-token doc fully embedded in a 10k-token doc has
    Jaccard ≈ 0.01 but containment 1.0 — the standard complement used
    by near-dup pipelines (Broder's containment, the C4/RefinedWeb
    "doc-inside-doc" gate).  Same scale shape as the Jaccard op: the
    gram self-join is Σ|bucket|² so the ``max_df`` stop-gram guard
    drops boilerplate grams from the WHOLE computation (sizes and
    intersections) — the score stays an exact containment over the
    filtered gram sets, SQL-replayable with a plain ``HAVING``.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    grams = docs.select(
        "doc_id", F.explode(F.array_distinct(grams_arr)).alias("gram")
    ).persist()
    if max_df is not None:
        keep = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("gram")
        )
        grams = grams.join(keep, "gram")
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    l = grams.select(F.col("doc_id").alias("a"), "gram")
    r = grams.select(F.col("doc_id").alias("b"), "gram")
    inter = (
        l.join(r, "gram")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n_grams").alias("na")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n_grams").alias("nb")),
            "b",
        )
        .select(
            "a",
            "b",
            (F.col("n_inter") / F.least("na", "nb")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    min_len: int | None = None,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact shared-substring (span-level) dedup: maximal runs of
    consecutive shared word ``k``-grams between document pairs —
    ``(a, b, start_a, start_b, span_len)`` with ``a < b``, 1-based
    token offsets, ``span_len`` in tokens (≥ k).

    This is the span-level dedup modality of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"):
    whole-doc hashes miss a 300-token license block pasted into
    otherwise-distinct pages; MinHash scores the *pair*, not *where*.
    Their suffix array is a shared-memory structure with no distributed
    analogue, so the semantics are re-expressed relationally:

    1. positional word k-grams ``(doc_id, p, gram)`` — O(total tokens),
       pure column expressions;
    2. stop-gram guard: grams with more than ``max_df`` total
       occurrences are dropped (a boilerplate gram shared by 10⁶ docs
       is a 10¹²-row join bucket — same guard as
       :func:`ngram_jaccard_pairs`; long spans survive because their
       OTHER k-grams still match, the run merely splits at hot grams);
    3. gram-bucket pair join (work Σ|bucket|², never n²);
    4. gaps-and-islands on the match diagonal: matches of a pair at
       offset delta ``d = p_a − p_b`` with consecutive ``p_a`` form one
       maximal span (``p_a − row_number`` constant within an island) —
       one window over ``(a, b, d)``, partition-local after the join
       shuffle.

    A shared literal span of ``L ≥ k`` tokens yields exactly one output
    row with ``span_len = L`` (when its grams pass the guard).
    ``min_len`` filters short incidental matches (Lee et al. use 50
    BPE tokens); default keeps every span.
    """
    from pyspark.sql import Window

    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.split(t, r"\s+")
    nw = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(toks))
    base = docs.select(
        "doc_id", toks.alias("__t"), nw.alias("nw")
    ).where(F.col("nw") >= k)
    grams = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("nw") - F.lit(k - 1))).alias("p"),
        F.col("__t"),
    ).select(
        "doc_id",
        "p",
        F.concat_ws(" ", F.slice("__t", F.col("p"), F.lit(k))).alias("gram"),
    )
    if max_df is not None:
        grams = grams.persist()
        keep = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("gram")
        )
        grams = grams.join(keep, "gram")
    ga = grams.select(
        F.col("doc_id").alias("a"), F.col("p").alias("pa"), "gram"
    )
    gb = grams.select(
        F.col("doc_id").alias("b"), F.col("p").alias("pb"), "gram"
    )
    matches = ga.join(gb, "gram").where(F.col("a") < F.col("b")).select(
        "a", "b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("d")
    )
    w = Window.partitionBy("a", "b", "d").orderBy("pa")
    isl = matches.select(
        "a",
        "b",
        "d",
        "pa",
        "pb",
        (F.col("pa") - F.row_number().over(w)).alias("isle"),
    )
    spans = isl.groupBy("a", "b", "d", "isle").agg(
        F.min("pa").alias("start_a"),
        F.min("pb").alias("start_b"),
        (F.count(F.lit(1)) + F.lit(k - 1)).alias("span_len"),
    ).select("a", "b", "start_a", "start_b", "span_len")
    if min_len is not None:
        spans = spans.where(F.col("span_len") >= min_len)
    return spans


def remove_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    min_len: int | None = None,
    max_df: int | None = 1000,
) -> DataFrame:
    """The actionable half of :func:`duplicate_spans` (Lee et al. 2022
    §4: keep ONE occurrence of each duplicated substring): rewrite
    every document with its duplicated span tokens removed —
    ``(doc_id, n_tokens, n_removed, text_dedup)``.

    Keep policy is deterministic and order-free: a span match
    ``(a < b)`` keeps the occurrence in ``a`` and marks ``b``'s token
    range for removal; a doc that is the ``b`` side of several pairs
    removes the union of the ranges (overlaps collapse via DISTINCT
    positions).  Docs with no matches pass through with their
    whitespace normalized (single-space joins — the same token stream
    both engines see).

    Scale shape: span detection as in :func:`duplicate_spans`; the
    removal set explodes spans to (doc, position) rows — bounded by the
    total duplicated text volume, not the corpus; reassembly is one
    anti join on (doc, pos) + per-doc sorted-struct array join (the
    retry-stable positional reassembly used by feature aggregation),
    never a window over the full token stream.
    """
    spans = duplicate_spans(
        docs, text_col=text_col, k=k, min_len=min_len, max_df=max_df
    )
    removal = (
        spans.select(
            F.col("b").alias("doc_id"),
            F.explode(
                F.sequence(
                    F.col("start_b"),
                    F.col("start_b") + F.col("span_len") - 1,
                )
            ).alias("p"),
        )
        .dropDuplicates(["doc_id", "p"])
    )
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.split(t, r"\s+")
    nw = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(toks))
    base = docs.select("doc_id", toks.alias("__t"), nw.alias("nw"))
    tokens = base.where(F.col("nw") >= 1).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("nw"))).alias("p"),
        F.col("__t"),
    ).select("doc_id", "p", F.element_at("__t", F.col("p")).alias("tok"))
    kept = tokens.join(removal, ["doc_id", "p"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("p"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    sizes = base.select("doc_id", F.col("nw").alias("n_tokens"))
    return (
        sizes.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


# -- exact set-similarity join (prefix filtering) -----------------------------


def setsim_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT whole-document token-set Jaccard join: every pair ``(a, b,
    jaccard)`` with ``a < b`` and ``J(A, B) >= threshold`` over the
    documents' distinct word sets — no approximation, no candidate
    misses.

    This is the AllPairs/PPJoin *prefix-filtering* formulation (Bayardo
    et al., WWW'07; Xiao et al., WWW'08), the standard exact complement
    to the probabilistic MinHash-LSH path (:func:`minhash_lsh_pairs`):

    1. rank every token by global document frequency ascending (ties by
       token), giving one total order shared by all documents;
    2. per document, sort its distinct tokens by that order and keep
       only the *prefix* — the ``|s| - floor(t*|s|) + 1`` rarest
       tokens.  Prefix-filter lemma: if ``J(A,B) >= t`` then ``|A∩B|
       >= ceil(t*max(|A|,|B|))``, and the globally smallest common
       token must sit inside BOTH prefixes of length ``|s| -
       ceil(t*|s|) + 1`` (everything before it in either document is
       non-shared).  The ``floor + 1`` form equals that bound when
       ``t*|s|`` is integral and is one token longer otherwise — never
       lossy, and immune to float wobble in ``t*|s|`` (a wobble either
       way leaves ``plen`` >= the required length).  The earlier
       ``|s| - floor(t*|s|)`` form WAS lossy exactly at integral
       ``t*|s|`` (at t=1.0 the prefix was empty — even identical
       documents were missed; caught by
       ``tests/test_property_r4.py::test_setsim_prefix_filter_complete``);
    3. candidates = equi-join on shared prefix token, pruned by the
       length filter ``min(|A|,|B|) >= t*max(|A|,|B|)``, deduplicated;
    4. exact verify on the candidate pairs only, via
       ``array_intersect`` of the full token arrays.

    Scale shape: the join key is a *prefix* token — by construction one
    of the globally rarest tokens in its document — so bucket sizes are
    bounded by low document frequencies and the quadratic blow-up a raw
    token self-join suffers on stopwords never materializes.  The
    verify stage re-joins candidate ids back to the token-array table
    instead of dragging arrays through the explode.  All JVM-side
    column expressions; the only shuffles are the df-count, the per-doc
    sort, the candidate equi-join, and the two verify joins.
    """
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("toks"),
    )
    tok = toks.select("doc_id", F.explode("toks").alias("token"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        tok.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "token"))).alias("st"))
        .select(
            "doc_id",
            F.transform("st", lambda s: s["token"]).alias("toks"),
            F.size("st").alias("sz"),
        )
        .withColumn(
            "plen",
            F.least(
                (
                    F.col("sz")
                    - F.floor(F.lit(threshold) * F.col("sz"))
                    + F.lit(1)
                ).cast("int"),
                F.col("sz").cast("int"),
            ),
        )
    )
    pref = ordered.select(
        "doc_id", "sz", F.explode(F.expr("slice(toks, 1, plen)")).alias("ptok")
    )
    cand = (
        pref.select(F.col("doc_id").alias("a"), F.col("sz").alias("na"), "ptok")
        .join(
            pref.select(
                F.col("doc_id").alias("b"), F.col("sz").alias("nb"), "ptok"
            ),
            "ptok",
        )
        .where(
            (F.col("a") < F.col("b"))
            & (
                F.least("na", "nb").cast("double")
                >= F.lit(threshold) * F.greatest("na", "nb") - F.lit(1e-9)
            )
        )
        .select("a", "b")
        .distinct()
    )
    ta = ordered.select(
        F.col("doc_id").alias("a"), F.col("toks").alias("ta"), F.col("sz").alias("na")
    )
    tb = ordered.select(
        F.col("doc_id").alias("b"), F.col("toks").alias("tb"), F.col("sz").alias("nb")
    )
    return (
        cand.join(ta, "a")
        .join(tb, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("ta", "tb")).alias("ni"),
            "na",
            "nb",
        )
        .select(
            "a",
            "b",
            (F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
