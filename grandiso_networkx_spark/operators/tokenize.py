"""Frequency-ranked vocabulary induction and tokenize-to-ids — the
corpus→tensor bridge of a training-data pipeline (SURVEY.md §2.7
class; no reference analogue — the reference is a motif matcher).

``vocab_table`` ranks the corpus's whitespace tokens by (count desc,
token asc) and keeps the top ``max_vocab`` as ids 0..max_vocab-1 — the
word-level equivalent of a tokenizer's vocab file, with a wholly
deterministic tie order so the mapping is stable across runs,
partitionings, and engines.  ``token_ids`` rewrites every document as
``(doc_id, pos, tid)`` rows under that mapping, out-of-vocabulary
tokens becoming ``unk_id`` (-1 by default) — the exploded form of an
``input_ids`` tensor, kept tall-not-nested so the result is exactly
SQL-checkable and downstream ops (packing, windowing) can reuse the
rows without re-tokenizing.

Scale shape: one tokenize-explode pass; the vocab build is one token
groupBy (map-side combined) + an ``orderBy().limit(max_vocab)``
(TakeOrdered — per-partition top-V then a merge of V-row heads, never
a full sort) so the one-partition ranking window sees only the
``max_vocab`` survivors, not the whole vocabulary (which at web scale
is 10^8-10^9 noisy types); the id rewrite is a broadcast join against
that small vocab.  No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _positioned_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """``(doc_id, pos, tok)`` — lower-cased whitespace tokens with
    0-based in-document positions; blank docs dropped."""
    t = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    return (
        docs.select("doc_id", F.split(t, r"\s+").alias("__t"), t.alias("__s"))
        .where(F.length("__s") > 0)
        .select("doc_id", F.posexplode("__t").alias("pos", "tok"))
    )


def vocab_table(
    docs: DataFrame, max_vocab: int, text_col: str = "text"
) -> DataFrame:
    """Top-``max_vocab`` vocabulary ``(tok, tid, n)`` with ids assigned
    by (count desc, token asc) — id 0 is the most frequent token."""
    if max_vocab <= 0:
        raise ValueError("max_vocab must be positive")
    counts = (
        _positioned_tokens(docs, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # TakeOrdered to the top max_vocab FIRST (same (count desc, token
    # asc) order as the ranking window) so the single-partition
    # row_number window ranks max_vocab rows, never the full
    # vocabulary — identical output to ranking-then-filtering.
    top = counts.orderBy(F.col("n").desc(), F.col("tok")).limit(max_vocab)
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return top.select(
        "tok", (F.row_number().over(w) - 1).cast("long").alias("tid"), "n"
    )


def token_ids(
    docs: DataFrame,
    vocab: DataFrame | None = None,
    max_vocab: int = 32768,
    unk_id: int = -1,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, pos, tid)`` — every document's token stream under the
    vocabulary mapping (``vocab`` defaults to :func:`vocab_table` of
    the corpus itself), OOV tokens mapped to ``unk_id``."""
    v = vocab if vocab is not None else vocab_table(docs, max_vocab, text_col)
    return (
        _positioned_tokens(docs, text_col)
        .join(F.broadcast(v.select("tok", "tid")), "tok", "left")
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.coalesce("tid", F.lit(unk_id).cast("long")).alias("tid"),
        )
    )


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit of the corpus unigram distribution — one row
    ``(n_types, n_tokens, slope, intercept, r2)`` from the least-
    squares regression of ``ln(freq)`` on ``ln(rank)`` over the whole
    vocabulary (natural text ⇒ slope ≈ -1; a far-off slope flags
    templated/synthetic corpora — the cheapest corpus-health
    diagnostic there is).

    Rank order is the deterministic :func:`vocab_table` order
    (count desc, token asc).  One tokenize pass + one vocabulary
    ``row_number`` (|V| rows by Heaps' law) + one closed-form
    regression aggregate (``covar_pop``/``var_pop`` — no iteration);
    population moments over exact ln values, so any SQL replay is
    IEEE-identical.
    """
    counts = (
        _positioned_tokens(docs, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    ranked = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
        "n",
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("n").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(
            (F.covar_pop("x", "y") * F.covar_pop("x", "y"))
            / (F.var_pop("x") * F.var_pop("y")),
            6,
        ).alias("r2"),
    )


def heaps_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heaps'-law fit of vocabulary growth — one row ``(n_types,
    n_tokens, beta, k, r2)`` from the least-squares regression of
    ``ln(V)`` on ``ln(position)`` over each type's first occurrence in
    the deterministic doc-id-ordered token stream (``V(n) ≈ K·n^β``,
    natural text ⇒ β ≈ 0.4-0.6 — the companion diagnostic to
    :func:`zipf_fit`: together they fingerprint whether a corpus's
    type/token statistics look like language or like templates).

    The global token position = per-doc offset (one running sum over
    the DOCUMENT count, tokens never globally sorted) + in-doc
    position; each type's first position is a ``min`` aggregate; the
    regression runs over |V| points.  At 10^12-token scale fit on a
    hash-sampled doc subset — the curve is scale-invariant under the
    deterministic sample, and the doc-offset window is the only
    global-order step.
    """
    pt = _positioned_tokens(docs, text_col)
    lens = pt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__len"))
    wdoc = Window.orderBy("doc_id")
    offs = lens.select(
        "doc_id",
        (F.sum("__len").over(wdoc) - F.col("__len")).alias("__off"),
    )
    first = (
        pt.join(offs, "doc_id")
        .select("tok", (F.col("__off") + F.col("pos")).alias("gpos"))
        .groupBy("tok")
        .agg(F.min("gpos").alias("first"))
    )
    wv = Window.orderBy("first")
    pts = first.select(
        F.log((F.col("first") + 1).cast("double")).alias("x"),
        F.log(F.row_number().over(wv).cast("double")).alias("y"),
    )
    total = pt.count()
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return pts.agg(
        F.count(F.lit(1)).alias("n_types"),
        # cast: a Python-int literal under 2^31 infers IntegerType and
        # the schema would silently flip to long past 2^31 tokens
        F.lit(total).cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("beta"),
        F.round(F.exp(F.avg("y") - slope * F.avg("x")), 6).alias("k"),
        F.round(
            (F.covar_pop("x", "y") * F.covar_pop("x", "y"))
            / (F.var_pop("x") * F.var_pop("y")),
            6,
        ).alias("r2"),
    )
