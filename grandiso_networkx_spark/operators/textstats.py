"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions (whole-stage
codegen friendly, pushdown-safe), each with a DuckDB oracle in
``__spark_entry__.oracle_sql`` — except :func:`compression_ratio`,
the one op whose kernel (zlib) has no JVM/SQL equivalent: it uses the
engine's Arrow-batched ``mapInPandas`` escape hatch and a rows-only
driver check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import hash60

# Tiny stopword marker sets per language — heuristic langid by marker
# hit counts (deterministic, SQL-parity).
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " y "],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation
    (a BPE-ish regex proxy — counts runs of letters in chunks of ~4,
    digit runs, and individual punctuation marks)."""
    words = F.regexp_count(text, F.lit(r"[A-Za-z]{1,4}"))
    digits = F.regexp_count(text, F.lit(r"[0-9]+"))
    punct = F.regexp_count(text, F.lit(r"[^\sA-Za-z0-9]"))
    return (words + digits + punct).cast("long")


def quality_columns(t: Column) -> dict[str, Column]:
    """The quality signals as named column expressions over a text
    column — composable into single-scan plans (see
    ``operators/curation.py``)."""
    length = F.length(t)
    toks = token_count(t)
    safe_len = F.greatest(length, F.lit(1)).cast("double")
    punct = F.regexp_count(t, F.lit(r"[^\sA-Za-z0-9]")).cast("double")
    upper = F.regexp_count(t, F.lit(r"[A-Z]")).cast("double")
    digit = F.regexp_count(t, F.lit(r"[0-9]")).cast("double")
    stop = F.regexp_count(
        F.concat(F.lit(" "), F.lower(t), F.lit(" ")),
        F.lit(r" (the|and|of|to|a|in|is|it) "),
    ).cast("double")
    return {
        "n_chars": length,
        "n_tokens": toks,
        "mean_token_len": F.round(
            length.cast("double") / F.greatest(toks, F.lit(1)), 6
        ),
        "punct_ratio": F.round(punct / safe_len, 6),
        "upper_ratio": F.round(upper / safe_len, 6),
        "digit_ratio": F.round(digit / safe_len, 6),
        "stopword_ratio": F.round(
            stop / F.greatest(toks, F.lit(1)).cast("double"), 6
        ),
    }


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token count, mean word
    length, punctuation/uppercase/digit ratios, stopword ratio."""
    cols = quality_columns(F.col(text_col))
    return docs.select(
        "doc_id", *(c.alias(name) for name, c in cols.items())
    )


def language_guess_col(text: Column) -> Column:
    """Marker-based language ID as a single column expression: argmax
    of per-language marker counts, 'und' when nothing hits.  Ties
    break by language code order."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum(
            (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit(""))))
            / len(m)
            for m in markers
        ).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    guess = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(guess)
    return guess


def language_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-based language ID per document (see
    ``language_guess_col``)."""
    return docs.select(
        "doc_id", language_guess_col(F.col(text_col)).alias("lang_guess")
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): the rolling-hash fingerprint set.

    Every ``k``-gram of the normalized text is hashed (portable 60-bit
    md5 prefix, identical in DuckDB); each window of ``w`` consecutive
    k-gram hashes contributes its minimum; the distinct minima are the
    document's fingerprints ``(doc_id, fp)``.  Guarantee: any shared
    substring of length ≥ ``k + w - 1`` yields at least one shared
    fingerprint, so fingerprint overlap detects partial-copy near-dups
    that whole-document hashing misses.  All JVM-side: explode + one
    ``w``-row sliding window aggregate per doc — no shuffles beyond
    the per-doc window sort.  Docs shorter than ``k`` emit nothing;
    docs with fewer than ``w`` k-grams emit their global minimum.
    """
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    d = docs.select("doc_id", norm.alias("__t")).where(F.length("__t") >= k)
    grams = d.select(
        "doc_id",
        (F.length("__t") - F.lit(k - 1)).alias("__ng"),
        F.explode(F.sequence(F.lit(1), F.length("__t") - F.lit(k - 1))).alias("pos"),
        F.col("__t"),
    ).select(
        "doc_id",
        "__ng",
        "pos",
        hash60(F.col("__t").substr(F.col("pos"), F.lit(k))).alias("__h"),
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("__h").over(win))
        .where(F.col("pos") <= F.greatest(F.col("__ng") - F.lit(w - 1), F.lit(1)))
        .select("doc_id", "fp")
        .distinct()
    )


def winnow_near_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Partial-copy near-dup pairs ``(a, b, shared_fps)`` by winnowing
    fingerprint overlap.

    Pairs meet only through the fingerprint equi-join (work is
    Σ|bucket|², never corpus²).  ``max_df`` drops *stop-fingerprints*
    — minima that occur in more than that many documents (boilerplate
    k-grams) — before the self-join, the skew guard that keeps hot
    buckets from going quadratic at corpus scale; exact pairs among
    dropped fingerprints are still found through their other shared
    fingerprints (winnowing emits many per document).
    """
    fps = winnow_fingerprints(docs, k, w, text_col)
    if max_df is not None:
        keep = fps.groupBy("fp").count().where(F.col("count") <= max_df)
        fps = fps.join(keep.select("fp"), "fp")
    a = fps.select(F.col("doc_id").alias("a"), "fp")
    b = fps.select(F.col("doc_id").alias("b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def _word_ngrams(
    docs: DataFrame, n: int, text_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, nw, gram)`` rows — every word ``n``-gram per document
    with the document's token count riding along.

    JVM-side only: split → explode positions → ``slice``+``concat_ws``.
    Work is O(total tokens) per call; no Python, no collect.  Blank
    docs count 0 tokens (``split(trim(''))`` yields ``['']``, guarded
    explicitly so Spark and the SQL oracle agree)."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(t, r"\s+")
    nw = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(toks))
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__t"), nw.alias("nw")
    )
    return (
        base.where(F.col("nw") >= n)
        .select(
            "doc_id",
            "nw",
            F.explode(
                F.sequence(F.lit(1), F.col("nw") - F.lit(n - 1))
            ).alias("p"),
            F.col("__t"),
        )
        .select(
            "doc_id",
            "nw",
            F.concat_ws(" ", F.slice("__t", F.col("p"), F.lit(n))).alias(
                "gram"
            ),
        )
    )


def _word_positions(docs: DataFrame, text_col: str) -> DataFrame:
    """``(doc_id, p, tok)`` — 1-based token positions, one scan."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(t, r"\s+")
    nw = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(toks))
    return (
        docs.select("doc_id", toks.alias("__t"), nw.alias("nw"))
        .where(F.col("nw") >= 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("nw"))).alias("p"),
            F.col("__t"),
        )
        .select("doc_id", "p", F.element_at("__t", F.col("p")).alias("tok"))
    )


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, adapted
    to word fractions for a single-line corpus): per document

    - ``n_words`` — whitespace token count;
    - ``dup_word_frac`` — occurrences of words appearing ≥2 times / n_words;
    - ``top_bigram_frac`` — (most frequent word-bigram count × 2) / n_words;
    - ``dup_trigram_frac`` — occurrences of word-trigrams appearing
      ≥2 times × 3 / n_words.

    High values mark the degenerate repeated-boilerplate documents a
    pretraining pipeline drops before dedup.  Scale shape: the corpus
    is tokenized and exploded ONCE (one column-pruned scan, T rows);
    bigrams/trigrams come from ``lead`` windows over the same
    positions frame, so the three gram branches share one identical
    window subtree — Spark's ReusedExchange materializes the
    ``(doc_id)``-keyed shuffle once and every branch reads it (at
    100 TB this is 1× the scan+window I/O where a naive 3-explode
    formulation pays 3×).  Per-gram counts then reduce by
    ``groupBy(doc_id, gram)`` with map-side combine (per-key
    cardinality bounded by the doc's own length — no global hot
    keys).  All built-in expressions, SQL-mirrorable (driver value
    check ``repetition_features``).
    """
    from pyspark.sql import Window

    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    nw = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    spine = docs.select("doc_id", nw.cast("long").alias("n_words"))

    w = Window.partitionBy("doc_id").orderBy("p")
    pos = _word_positions(docs, text_col)
    grams = pos.select(
        "doc_id",
        # lead(tok, 0) IS tok — written as a window function so the
        # unigram branch keeps the Window node and shares the same
        # (doc_id)-keyed exchange as the bigram/trigram branches
        # (otherwise Catalyst prunes the window there and that branch
        # re-scans the source)
        F.lead("tok", 0).over(w).alias("tok"),
        F.lead("tok", 1).over(w).alias("t2"),
        F.lead("tok", 2).over(w).alias("t3"),
    )

    def _reduce(col: F.Column, agg: F.Column, name: str) -> DataFrame:
        counts = (
            grams.where(col.isNotNull())
            .groupBy("doc_id", col.alias("gram"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return counts.groupBy("doc_id").agg(agg.alias(name))

    dup_agg = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
    dup1 = _reduce(F.col("tok"), dup_agg, "d1")
    top2 = _reduce(
        F.when(
            F.col("t2").isNotNull(),
            F.concat_ws(" ", F.col("tok"), F.col("t2")),
        ),
        F.max("c"),
        "m2",
    )
    dup3 = _reduce(
        F.when(
            F.col("t3").isNotNull(),
            F.concat_ws(" ", F.col("tok"), F.col("t2"), F.col("t3")),
        ),
        dup_agg,
        "d3",
    )
    safe = F.greatest(F.col("n_words"), F.lit(1)).cast("double")
    return (
        spine.join(dup1, "doc_id", "left")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round(F.coalesce(F.col("d1"), F.lit(0)) / safe, 6).alias(
                "dup_word_frac"
            ),
            F.round(
                F.coalesce(F.col("m2"), F.lit(0)) * 2 / safe, 6
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("d3"), F.lit(0)) * 3 / safe, 6
            ).alias("dup_trigram_frac"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: per document, how many of its
    distinct word ``n``-grams appear anywhere in the ``bench`` corpus
    (the standard 8–13-gram overlap test a pretraining pipeline runs
    against eval sets before training).

    Returns ``(doc_id, shared_ngrams, contaminated)`` for every doc in
    ``docs``; ``contaminated`` is true when any n-gram is shared.
    Scale shape: the benchmark side reduces to a **distinct-gram set**
    (tiny vs the corpus — eval suites are MBs against TBs), so the
    equi-join on ``gram`` broadcasts; corpus grams are deduped per doc
    before the join so a doc's own internal repetition can't inflate
    its overlap count.  No UDFs; value-checked by the driver
    (``contamination``)."""
    bcol = bench_text_col or text_col
    corpus = _word_ngrams(docs, n, text_col).select("doc_id", "gram").distinct()
    bench_grams = (
        _word_ngrams(
            bench.select(
                F.col(bcol).alias("__bt"),
                F.monotonically_increasing_id().alias("__bid"),
            ),
            n,
            "__bt",
            id_col="__bid",
        )
        .select("gram")
        .distinct()
    )
    hits = (
        corpus.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    spine = docs.select("doc_id")
    return spine.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("shared_ngrams"), F.lit(0)).alias("shared_ngrams"),
        (F.coalesce(F.col("shared_ngrams"), F.lit(0)) > 0).alias(
            "contaminated"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint of normalized text
    (whitespace-collapsed, lowercased) — a rolling-hash stand-in built
    from xxhash64, stable across partitionings."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(
        "doc_id", F.xxhash64(norm).alias("fp"), F.md5(norm).alias("fp_md5")
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram entropy ``(doc_id, n_words, entropy)`` in
    bits: ``H = -Σ (c/n)·log2(c/n)`` over the doc's token counts — low
    entropy marks repetitive/templated text (complements
    :func:`repetition_features`; a doc of one repeated word scores 0,
    an all-distinct doc scores log2(n)).  Empty docs score 0.

    One tokenize-explode pass + ``groupBy(doc_id, tok)`` then a
    per-doc aggregate — same shuffle discipline as the other gram
    ops; SQL-mirrorable (driver value check ``token_entropy``)."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    nw = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    spine = docs.select("doc_id", nw.cast("long").alias("n_words"))
    counts = (
        _word_positions(docs, text_col)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # H = -sum (c/n) log2(c/n) = log2(n) - (sum c*log2 c)/n — one
    # per-doc aggregate, no per-row probability column needed
    ent = counts.groupBy("doc_id").agg(
        (
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("__h")
    )
    return spine.join(ent, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.round(F.coalesce("__h", F.lit(0.0)), 6).alias("entropy"),
    )


def vocab_coverage(
    docs: DataFrame, text_col: str = "text", top_v: int = 1000
) -> DataFrame:
    """``(rank, tok, n, cum_frac)`` — the corpus's top-``top_v`` token
    frequencies with cumulative coverage of ALL token occurrences: the
    vocabulary-size planning curve (how much of the corpus a V-entry
    vocab covers before falling back to byte/unk pieces).

    Ties broken lexicographically so the curve is deterministic.

    Scale shape: the corpus-wide token counts are one map-side-combined
    ``groupBy(tok)``; the global ordering is then taken over only the
    ``top_v`` survivors (orderBy+limit = TakeOrdered, never a full
    sort) so the one-partition cumulative window runs on ``top_v``
    rows, not the whole vocabulary.  The coverage denominator is the
    full corpus token count (a scalar aggregate), so ``cum_frac`` is
    exact even though only ``top_v`` rows are returned.
    """
    counts = (
        _word_positions(docs, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    total = counts.agg(F.sum("n")).collect()[0][0] or 1
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(top_v)
    counts.unpersist()
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc("n"), F.asc("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("tok"))).alias("rank"),
        "tok",
        "n",
        F.round(F.sum("n").over(w) / F.lit(float(total)), 6).alias("cum_frac"),
    )


def source_quality_rollup(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(source, n_docs, total_tokens, avg_tokens, avg_punct_ratio,
    dup_frac)`` — per-source corpus health: the decision table for
    dropping low-quality or heavily-duplicated domains/sources before
    training.  ``dup_frac`` is the share of the source's docs whose
    exact content hash appears more than once CORPUS-wide (a source
    that mostly mirrors others scores high even if internally unique).

    Scale shape: one scan computes per-doc signals + content hash; the
    dup flag is a ``groupBy(hash)`` (narrow 32-char keys, map-side
    combined) joined back; the rollup is a ``groupBy(source)`` whose
    group count is the number of sources — every aggregation partial.
    """
    cols = quality_columns(F.col(text_col))
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        cols["n_tokens"].alias("__nt"),
        cols["punct_ratio"].alias("__pr"),
        F.md5(F.col(text_col)).alias("__h"),
    )
    dup_h = per_doc.groupBy("__h").agg(
        (F.count(F.lit(1)) > 1).alias("__dup")
    )
    return (
        per_doc.join(dup_h, "__h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("total_tokens"),
            F.round(F.avg("__nt"), 6).alias("avg_tokens"),
            F.round(F.avg("__pr"), 6).alias("avg_punct_ratio"),
            F.round(
                F.avg(F.col("__dup").cast("double")), 6
            ).alias("dup_frac"),
        )
    )


def compression_ratio(
    docs: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Per-doc zlib compression ratio ``(doc_id, n_bytes, ratio)`` —
    ``compressed_len / raw_len`` of the UTF-8 text (1-byte docs and
    blanks score null).  Low ratios flag templated/repetitive text
    with redundancy that token-level signals miss (the ccnet-style
    "compression filter").

    This is the engine's vectorized-Python escape hatch used for
    REAL work (not a stub): zlib has no JVM-side column expression,
    so the kernel is an Arrow-batched ``mapInPandas`` — whole pandas
    batches in/out, no per-row Python round trips, projection pushed
    to (doc_id, text) before the Python stage.  Deterministic (zlib
    level fixed), so rows-equal across runs; no SQL oracle exists →
    rows-only driver check (``compression_ratio``), exactness pinned
    in pytest vs direct zlib.
    """
    import pandas as pd  # noqa: F401 - signature requirement

    # doc_id keeps its source type (string corpora exist) — only the
    # computed columns pin theirs.
    id_type = docs.schema["doc_id"].dataType.simpleString()
    schema = f"doc_id {id_type}, n_bytes long, ratio double"
    src = docs.select("doc_id", F.col(text_col).alias("__t"))

    def _kernel(batches):
        import zlib

        for pdf in batches:
            texts = pdf["__t"].fillna("")
            raw = texts.str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = n_bytes
            out["ratio"] = (comp / n_bytes.clip(lower=1)).where(
                n_bytes > 1
            ).round(6)
            yield out

    return src.mapInPandas(_kernel, schema)
