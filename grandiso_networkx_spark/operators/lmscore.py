"""Corpus-trained unigram language-model scoring — the CCNet-style
"perplexity bucket" quality signal (Wenzek et al. 2020) reduced to a
unigram LM so it is exactly SQL-mirrorable: train token frequencies on
the corpus itself, score each document by its mean token log-prob, and
bucket into head/middle/tail terciles.

Scale shape (the 100 TB path):
- ONE tokenize-explode pass (column-pruned scan of ``(doc_id,
  text)``); the token stream is O(total tokens), never materialized
  per-document Python-side.
- The "model" is the token-frequency table — ``groupBy(tok)`` with
  map-side partial aggregation; vocabulary is tiny relative to the
  corpus (Heaps' law), so the score join broadcasts the model when it
  fits (Spark's AQE converts it automatically under the broadcast
  threshold; we also hint it).
- Per-doc score = one more ``groupBy(doc_id)`` — the same shuffle key
  the downstream curation filters use.

No reference analogue (the reference is a motif matcher —
`grandiso/__init__.py:26`); mandated by SURVEY.md §2.7 (quality
scoring family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """``(doc_id, tok)`` — lower-cased whitespace tokens, blank docs
    dropped (same convention as textstats tokenization)."""
    t = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    return (
        docs.select("doc_id", F.split(t, r"\s+").alias("__t"), t.alias("__s"))
        .where(F.length("__s") > 0)
        .select("doc_id", F.explode("__t").alias("tok"))
    )


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token → ``(tok, n, logp)`` with ``logp = ln(n / total)``.

    ``total`` is attached via a broadcast of the single-row grand
    total, so the model build is one shuffle (the token groupBy).
    """
    toks = _doc_tokens(docs, text_col)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "tok",
        "n",
        F.log(F.col("n") / F.col("__total")).alias("logp"),
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram log-prob ``(doc_id, n_tokens,
    mean_logp)`` — higher (closer to 0) = more typical of the corpus;
    very negative = rare-token soup, a classic junk signal.

    When ``model`` is None the corpus itself is the training set
    (self-scoring, the usual curation setup); pass a held-out model to
    score against a reference corpus instead.  The model side is
    broadcast-hinted: vocabulary ≪ corpus by Heaps' law, so the score
    join is map-side at any realistic scale.
    """
    m = model if model is not None else unigram_model(docs, text_col)
    toks = _doc_tokens(docs, text_col)
    return (
        toks.join(F.broadcast(m.select("tok", "logp")), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("logp").alias("mean_logp"),
        )
    )


def lm_quality_buckets(
    docs: DataFrame, text_col: str = "text", n_buckets: int = 3
) -> DataFrame:
    """CCNet-style quality terciles: ``(doc_id, n_tokens, mean_logp,
    bucket)`` where bucket 1 = most-typical ``1/n_buckets`` of the
    corpus (head), ``n_buckets`` = tail.

    Uses ``ntile`` over a global ordering — a single-partition window
    at the very end, over one row per document (already reduced), the
    same cost class as any global ranking; for 100 TB switch to
    ``approxQuantile`` cutpoints + a join, which this function's
    bucket semantics deliberately match (equal-frequency bins).
    """
    from pyspark.sql import Window

    scored = unigram_logprob(docs, text_col)
    w = Window.orderBy(F.col("mean_logp").desc(), F.col("doc_id"))
    return scored.select(
        "doc_id",
        "n_tokens",
        "mean_logp",
        F.ntile(n_buckets).over(w).alias("bucket"),
    )
