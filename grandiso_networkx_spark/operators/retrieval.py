"""BM25 ranked retrieval + TF-IDF weighting over a document table
(training-data pipeline op — not in the reference; SURVEY.md §2.7
class, next to dedup/similarity/textstats).

Spark-first shape, no UDFs anywhere:

- Tokenization is built-in expressions (``lower`` + ``regexp_replace``
  + ``split``) — whole-stage codegen, identical semantics to the ANSI
  SQL oracle.
- The token explode is filtered to the query's terms BEFORE any
  aggregation, so the full |corpus| x avg_dl token stream is never
  shuffled — only matching (doc, term) rows reach the tf groupBy.
- Document length (``dl``) comes from a column expression (``size``
  of the split array), not from the explode, so non-matching docs are
  never expanded at all.
- Corpus statistics (N, avgdl) ride a broadcast 1-row frame.
- Top-k is ``orderBy().limit(k)`` — Spark plans TakeOrdered (per-
  partition heaps + driver merge), NOT a single-partition window, so
  the ranking step scales with the number of matching docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def norm_tokens(text: Column) -> Column:
    """Lower-cased alphanumeric tokens as an array column."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " ")), " "
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a bag-of-words query.

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Robertson-Sparck
    Jones with the +1 floor, as in Lucene), ``score = sum_t idf_t *
    tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``.  Scores are rounded to
    6 decimals and ties break on ``doc_id`` ascending, so the result
    set is deterministic and matches the DuckDB oracle bit-for-bit.

    Returns ``(doc_id, score double)``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = norm_tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.size(toks).alias("dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .where(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf is already distinct per (doc, term), so df is a plain count.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    w = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(w), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def tfidf_terms(
    docs: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Smoothed TF-IDF weight per (doc, term) — the weighting table a
    downstream vectorizer/clusterer consumes.

    ``tfidf = (tf / dl) * ln((1 + N) / (1 + df)) + 1-free form``:
    here the scikit-style smooth idf ``ln((1+N)/(1+df)) + 1`` with L1
    tf normalization, rounded to 6 decimals.  ``min_df`` drops rare
    terms (noise control; applied AFTER df so the oracle is exact).

    Returns ``(doc_id, term, tfidf double)``.
    """
    toks = norm_tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.size(toks).alias("dl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = (F.col("tf") / F.col("dl")) * (
        F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    )
    return (
        tf.join(dfreq.where(F.col("df") >= min_df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", F.round(tfidf, 6).alias("tfidf"))
    )
