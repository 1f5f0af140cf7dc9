"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions (whole-stage
codegen friendly, pushdown-safe) — no UDFs at all.  Every op is also
expressible in ANSI SQL, so each has a DuckDB oracle in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

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
        F.conv(
            F.substring(F.md5(F.col("__t").substr(F.col("pos"), F.lit(k))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("__h"),
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


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint of normalized text
    (whitespace-collapsed, lowercased) — a rolling-hash stand-in built
    from xxhash64, stable across partitionings."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(
        "doc_id", F.xxhash64(norm).alias("fp"), F.md5(norm).alias("fp_md5")
    )
