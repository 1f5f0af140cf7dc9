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

    Equal-frequency bins with ``ntile``'s exact rule (bucket sizes
    differ by at most 1, the larger buckets first), but WITHOUT
    ``ntile``'s single-partition window: the global rank comes from
    the parallel range-partition + offset machinery
    (:func:`..functions.rank.global_row_number` — the
    ``(round(mean_logp, 6) desc, doc_id)`` order is total and portable
    across engines/partitionings), and the bucket is a
    closed-form expression of (rank, N) with N one scalar count — so
    the per-document frame is never forced through one task, and the
    output is bit-identical to the ntile formulation at any
    partitioning.
    """
    from ..functions.rank import global_row_number

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    scored = unigram_logprob(docs, text_col).persist()
    n = scored.count()
    if n == 0:
        scored.unpersist()
        return scored.select(
            "doc_id", "n_tokens", "mean_logp",
            F.lit(1).alias("bucket"),
        )
    spark = docs.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    # Rank on round(mean_logp, 6), not the raw double: Spark's
    # nondeterministic partial-aggregation order can shift the sum in
    # the last ulp between runs/partitionings, and an ulp flip at a
    # bucket boundary would flip two docs' buckets.  Rounding makes
    # the (score, doc_id) order portable — identically-tokenized docs
    # tie exactly and break by doc_id on every engine.
    ranked = global_row_number(
        scored,
        [F.round(F.col("mean_logp"), 6).desc(), F.col("doc_id")],
        nparts,
    )
    # global_row_number localCheckpoints eagerly, so the scored cache
    # can be released immediately
    scored.unpersist()
    q, rem = divmod(n, n_buckets)
    head = rem * (q + 1)
    r = F.col("__rank")
    # ntile's exact assignment: the first (n % k) buckets hold
    # floor(n/k)+1 rows, the rest floor(n/k).
    bucket = (
        F.when(r <= F.lit(head), F.floor((r - 1) / F.lit(q + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((r - 1 - head) / F.lit(max(q, 1))) + 1)
    )
    return ranked.select(
        "doc_id",
        "n_tokens",
        "mean_logp",
        bucket.cast("int").alias("bucket"),
    )


def _doc_bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """``(doc_id, w1, w2)`` — adjacent lower-cased token pairs within
    each document (docs with < 2 tokens yield none).  One shuffle: the
    per-document ``lead`` window partitions by ``doc_id``."""
    from pyspark.sql import Window

    t = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    toks = (
        docs.select("doc_id", F.split(t, r"\s+").alias("__t"), t.alias("__s"))
        .where(F.length("__s") > 0)
        .select("doc_id", F.posexplode("__t").alias("pos", "w1"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.select("doc_id", "w1", F.lead("w1").over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
    )


def bigram_model(
    docs: DataFrame, text_col: str = "text", k: float = 1.0
) -> DataFrame:
    """Add-k-smoothed bigram LM trained on the corpus: ``(w1, w2, n,
    logp, __v, __k)`` with ``logp = ln((n + k) / (context(w1) + k·V))``
    where ``context(w1)`` is w1's occurrence count as a bigram left
    side and ``V`` the corpus unigram vocabulary size — the KenLM-style
    signal one notch above the unigram scorer, still exactly
    SQL-mirrorable.

    The smoothing parameters travel WITH the model as constant columns
    ``__v`` (training-corpus unigram vocabulary size, double) and
    ``__k`` (the add-k constant), so :func:`bigram_logprob` can score
    held-out text with exactly the model's own smoothed-zero floor —
    V from the model's bigram *support* (distinct w1∪w2) would differ
    whenever a training token never enters a bigram (single-token
    docs), making per-context probabilities inconsistent.

    Scale shape: one tokenize pass + one ``lead`` window (shuffle by
    doc_id) + one bigram groupBy; context counts derive from the
    bigram table itself (no second scan); V and the context table are
    broadcast-size (Heaps' law).
    """
    bg = _doc_bigrams(docs, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    c1 = c2.groupBy("w1").agg(F.sum("n").alias("__cn"))
    vocab = (
        _doc_tokens(docs, text_col)
        .agg(F.countDistinct("tok").cast("double").alias("__v"))
    )
    return (
        c2.join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "n",
            F.log(
                (F.col("n") + F.lit(k)) / (F.col("__cn") + F.lit(k) * F.col("__v"))
            ).alias("logp"),
            "__v",
            F.lit(float(k)).alias("__k"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    model: DataFrame | None = None,
    k: float = 1.0,
) -> DataFrame:
    """Per-document mean bigram log-prob ``(doc_id, n_bigrams,
    mean_logp)``; documents with fewer than 2 tokens are dropped
    (they have no bigrams to score).

    Self-scoring (``model=None``) never meets an unseen bigram.  With
    a held-out ``model`` (a :func:`bigram_model` result carrying its
    ``__v``/``__k`` smoothing columns), unseen pairs are scored by the
    add-k floor — the model's per-context smoothed zero, using the
    model's own training V and k — via a left join + coalesce against
    the model's context marginals; fully-unseen contexts get
    ``ln(1/V)``.  For a bare ``(w1, w2, n, logp)`` model frame (no
    carried parameters) the floor falls back to V = the model's bigram
    support (distinct w1∪w2) and the ``k`` argument — the documented
    legacy rule, inconsistent with the trained model whenever training
    tokens never entered a bigram.
    """
    if model is None:
        m = bigram_model(docs, text_col, k=k)
    else:
        m = model
    bg = _doc_bigrams(docs, text_col)
    # context floor: ln(k / (context + k·V)) per seen w1; ln(1/V) else.
    # (__v, __k) ride the model when present (one tiny agg over the
    # broadcast-size model — no driver action); support-derived V is
    # the back-compat fallback.
    c1 = m.groupBy("w1").agg(F.sum("n").alias("__cn"))
    if "__v" in m.columns:
        params = m.agg(
            F.max("__v").alias("__v"),
            (F.max("__k") if "__k" in m.columns else F.lit(float(k))).alias("__k"),
        )
    else:
        params = (
            m.select("w2").union(m.select("w1"))
            .agg(F.countDistinct("w2").cast("double").alias("__v"))
            .select("__v", F.lit(float(k)).alias("__k"))
        )
    floor_seen = F.log(F.col("__k") / (F.col("__cn") + F.col("__k") * F.col("__v")))
    scored = (
        bg.join(F.broadcast(m.select("w1", "w2", "logp")), ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .crossJoin(F.broadcast(params))
        .select(
            "doc_id",
            F.coalesce(
                "logp",
                F.when(F.col("__cn").isNotNull(), floor_seen).otherwise(
                    F.log(F.lit(1.0) / F.col("__v"))
                ),
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("mean_logp"),
    )
